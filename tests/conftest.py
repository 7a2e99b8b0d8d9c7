"""Test configuration: force CPU backend with 8 virtual devices.

Sharding/pjit tests exercise multi-chip paths without TPU hardware
(SURVEY.md section 4 "Multi-node testing without a cluster").
"""

import os

# The session env pins JAX_PLATFORMS to the TPU backend (and a site hook sets
# jax_platforms to "axon,cpu" regardless of the env var), so override both the
# env var and the live jax config unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Quick/slow tiering (VERDICT-r4 item 7): whole modules dominated by
# e2e pipelines, microsim suites, or interpret-mode kernel sweeps are
# marked slow so `scripts/ci.sh` can run a <3 min quick tier by default.
# Measured with `pytest --durations=60` 2026-08-20; everything else is
# quick. Individual heavyweights from otherwise-quick modules are listed
# in SLOW_TESTS (by originalname, so all parametrizations are covered) --
# the quick tier keeps at least basic coverage of every module.
SLOW_MODULES = {
    "test_full_pipeline",        # collect->train->checkpoint->resume->eval
    "test_microsim_full_loop",   # expert collect -> label -> train -> drive
    "test_microsim",             # 44 scenario types + route suite
    "test_scenarios_b2d",        # per-scenario closed-loop ability checks
    "test_flash_attention",      # interpret-mode fwd+bwd sweeps
    "test_hf_checkpoint",        # torch-parity at reduced geometry
    "test_model_parity",         # full-model cross-impl comparisons
    "test_pipeline_parallel",    # pp2 full-train-step comparisons
    "test_sequence_parallel",    # sp2 full-train-step comparisons
}
SLOW_TESTS = {
    "test_cached_decode_token_parity",              # test_infer
    "test_remat_modes_grad_identical",              # test_simlingo_model
    "test_gradients_flow_everywhere",               # test_simlingo_model
    "test_gathered_ce_equals_full_ce",              # test_simlingo_model
    "test_agent_replay_end_to_end",                 # test_agent
    "test_agent_speculative_acceptance_on_repeated_frame",  # test_agent
    "test_int4_generation_close_to_bf16",           # test_quantize
    "test_good_draft_reduces_forwards",             # test_speculative
    "test_exact_parity_with_garbage_draft",         # test_speculative
    "test_eos_truncation_parity",                   # test_speculative
    "test_train_step_sharded_matches_replicated",   # test_train_step
    "test_bf16_training_tracks_fp32",               # test_train_step
    "test_visualise_callback",                      # test_train_step
    "test_model_agent_plugin_run_step_offline",     # test_carla_plugins
    "test_base_model_forward_and_loss_improves",    # test_simlingo_base
    "test_clip_vit_parity_with_hf",                 # test_simlingo_base
    "test_generation_with_lora",                    # test_infer
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in SLOW_MODULES
                or getattr(item, "originalname", item.name) in SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
