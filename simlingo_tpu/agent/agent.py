"""Closed-loop driving agent core (simulator-independent).

Counterpart of reference `team_code/agent_simlingo.py` (LingoAgent) with the
CARLA plumbing factored out (see carla_agent.py for the leaderboard plugin):

  * per-frame pipeline: camera preprocessing (hood crop + 1x2 448-tiling +
    normalize), UKF ego-state filtering, prompt construction (CoT commentary
    question or action-only), jit-compiled TPU inference (prefill + KV-cache
    decode + driving-query forward -- the reference re-forwards the whole
    prefix per generated token), PID control;
  * stuck detection + creep throttle (reference :881-894);
  * fully testable offline through agent/replay.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from simlingo_tpu.agent.config import AgentConfig
from simlingo_tpu.agent.controllers import VehicleController
from simlingo_tpu.agent.ukf import EgoUKF
from simlingo_tpu.core.structs import DrivingInput
from simlingo_tpu.data.prompts import batch_language_label, tokenize_chat
from simlingo_tpu.data.tokenizer import SimLingoTokenizer
from simlingo_tpu.models.simlingo import SimLingoConfig


@dataclasses.dataclass
class AgentFrame:
    """One simulator tick's sensor payload (already CARLA-decoupled)."""
    rgb: np.ndarray                 # [H, W, 3] uint8 front camera
    speed: float                    # m/s
    target_point: np.ndarray        # [2] ego-frame
    next_target_point: np.ndarray   # [2] ego-frame
    compass: float = 0.0
    gps: Optional[np.ndarray] = None
    user_instruction: Optional[str] = None   # interactive <SAFETY>/... prompts


class LingoAgent:
    def __init__(self, params: Dict[str, Any], model_cfg: SimLingoConfig,
                 agent_cfg: Optional[AgentConfig] = None,
                 tokenizer: Optional[SimLingoTokenizer] = None,
                 max_prompt_len: int = 640,
                 compute_dtype=None):
        import jax
        import jax.numpy as jnp
        from simlingo_tpu.infer import runner

        self.cfg = agent_cfg or AgentConfig()
        self.tok = tokenizer or SimLingoTokenizer()
        # the model's image-token id must match the tokenizer's (checkpoint
        # fidelity, SURVEY hard part #1)
        if model_cfg.img_context_token_id != self.tok.img_context_id:
            model_cfg = dataclasses.replace(
                model_cfg, img_context_token_id=self.tok.img_context_id)
        self.model_cfg = model_cfg
        # fold LoRA into the base weights: removes low-rank matmuls from the
        # per-frame decode loop
        if "lora" in params and model_cfg.llm.lora_r > 0:
            from simlingo_tpu.models import qwen2 as _q
            params = dict(params)
            params["llm"] = _q.merge_lora(params["llm"], params.pop("lora"),
                                          model_cfg.llm)
        if self.cfg.int4_llm or self.cfg.int8_llm:
            from simlingo_tpu.core.quantize import quantize_llm
            params = dict(params)
            params["llm"] = quantize_llm(params["llm"],
                                         bits=4 if self.cfg.int4_llm else 8)
        self.params = params
        self.max_prompt_len = max_prompt_len
        self.controller = VehicleController(self.cfg)
        self.ukf = EgoUKF(dt=1.0 / self.cfg.carla_fps)
        compute_dtype = compute_dtype or jnp.bfloat16

        gen_cfg = runner.GenerateConfig(
            max_new_tokens=self.cfg.max_new_tokens,
            eos_token_id=self.tok.eos_token_id)

        # Device-side preprocessing: raw uint8 frames go to the TPU and
        # crop/resize/normalize/tile fuse into the inference program
        # (north-star fused-preprocessing path; reference does this on CPU
        # with PIL/torchvision, internvl2_utils.py:179-267 + agent tick).
        from simlingo_tpu.data.image_pipe import preprocess_device

        def _with_device_preprocess(fn):
            def wrapped(p, d, *extra):
                raw = d.pixel_values                      # [B, H, W, 3] uint8
                tiles = preprocess_device(
                    raw, image_size=model_cfg.vit.image_size,
                    grid=(2, 1), do_bottom_crop=True).astype(compute_dtype)
                return fn(p, d.replace(pixel_values=tiles), *extra)
            return wrapped

        self._generate = jax.jit(_with_device_preprocess(
            lambda p, d: runner.generate_and_drive(p, d, model_cfg, gen_cfg,
                                                   compute_dtype=compute_dtype)))
        self._drive_only = jax.jit(_with_device_preprocess(
            lambda p, d: runner.drive_only(p, d, model_cfg,
                                           compute_dtype=compute_dtype)))
        # speculative CoT: same output tokens as _generate (drafts are
        # verified against the model's own argmax), fewer LLM forwards;
        # draft tables rebuilt every frame from the rolling corpus of the
        # agent's recent commentary (config.speculative_cot)
        self._spec_corpus: list = []
        self._draft_tables = None
        if self.cfg.use_cot and self.cfg.speculative_cot:
            from simlingo_tpu.infer import speculative as _spec

            def _gen_spec(p, d, t):
                return _spec.generate_and_drive_spec(
                    p, d, model_cfg, gen_cfg, t, spec_k=self.cfg.spec_k,
                    compute_dtype=compute_dtype, return_stats=True)
            self._generate_spec = jax.jit(_with_device_preprocess(_gen_spec))
        self.spec_stats: list = []   # (rounds, gen_len) per speculative frame

        if self.cfg.warmup_compile:
            self.warmup()

        self.step_count = 0
        self.stuck_count = 0
        self.creep_remaining = 0
        self.latencies: list = []
        self.last_control = (0.0, 0.0, False)
        self.last_language = ""
        # per-frame metric dump (reference agent_simlingo.py:905-911)
        import os
        self.metric_path = os.environ.get("SIMLINGO_METRIC_INFO")
        self._metric_file = open(self.metric_path, "a") if self.metric_path else None

    # ------------------------------------------------------------------
    def warmup(self) -> None:
        """Compile every per-frame program on a dummy frame at setup time
        so no simulator tick pays a jit compile (the leaderboard grants
        setup time before the route starts; a mid-episode compile stall
        would blow the frame budget). Shapes match production exactly:
        camera dims from config, left-padded prompt, production draft-table
        sizes."""
        import jax
        import jax.numpy as jnp
        frame = AgentFrame(
            rgb=np.zeros((self.cfg.camera_height, self.cfg.camera_width, 3),
                         np.uint8),
            speed=0.0, target_point=np.array([5.0, 0.0]),
            next_target_point=np.array([10.0, 0.0]))
        di = self.make_input(frame)
        jax.block_until_ready(self._drive_only(self.params, di))
        if self.cfg.use_cot:
            jax.block_until_ready(self._generate(self.params, di))
            if self.cfg.speculative_cot:
                from simlingo_tpu.infer import speculative as _spec
                tables = _spec.build_draft_tables(
                    [[0, 1, 2]], self.model_cfg.llm.vocab_size)
                dt = jax.device_put(
                    {k: jnp.asarray(v) for k, v in tables.items()})
                jax.block_until_ready(
                    self._generate_spec(self.params, di, dt))

    # ------------------------------------------------------------------
    def _refresh_draft(self, tokens: List[int]) -> None:
        """Rebuild the speculative-draft tables from the rolling corpus of
        recent commentary (host-side, ~1 ms for a few hundred tokens).
        Consecutive frames produce near-identical templated text, so the
        previous frames are the best available draft source."""
        from simlingo_tpu.infer import speculative as _spec
        import jax
        import jax.numpy as jnp
        self._spec_corpus.append(list(tokens))
        if len(self._spec_corpus) > self.cfg.spec_corpus_frames:
            self._spec_corpus.pop(0)
        tables = _spec.build_draft_tables(self._spec_corpus,
                                          self.model_cfg.llm.vocab_size)
        self._draft_tables = jax.device_put(
            {k: jnp.asarray(v) for k, v in tables.items()})

    # ------------------------------------------------------------------
    def filter_ego_state(self, pos_xy: np.ndarray, yaw: float, speed: float
                         ) -> Tuple[np.ndarray, float, float]:
        """UKF-filter the raw GPS/IMU/speed measurement through the bicycle
        model, using the previous tick's control as the process input
        (reference agent_simlingo.py:507-529 runs this every tick; raw GPS
        is meter-level noisy). Returns (pos [2], yaw, speed) filtered."""
        z = np.array([pos_xy[0], pos_xy[1], yaw, speed], float)
        if not self.ukf.initialized:
            self.ukf.init_state(z)
            return np.asarray(pos_xy, float), float(yaw), float(speed)
        steer, throttle, brake = self.last_control
        self.ukf.predict(steer, throttle, brake)
        self.ukf.update(z)
        x = self.ukf.x
        return x[:2].copy(), float(x[2]), float(max(x[3], 0.0))

    # ------------------------------------------------------------------
    def build_prompt(self, frame: AgentFrame) -> Tuple[str, Dict[str, np.ndarray]]:
        speed_rounded = round(float(frame.speed), 1)
        tps = np.stack([frame.target_point, frame.next_target_point]) \
            .astype(np.float32)
        placeholder_values = {"<TARGET_POINT>": tps}
        conditioning = "Target waypoint: <TARGET_POINT><TARGET_POINT>."
        if self.cfg.use_cot:
            task = "What should the ego do next?"
        else:
            task = "Predict the waypoints."
        prompt = f"Current speed: {speed_rounded} m/s. {conditioning} {task}"
        if frame.user_instruction:
            prompt = f"{frame.user_instruction} {prompt}"
        return prompt, placeholder_values

    def make_input(self, frame: AgentFrame) -> DrivingInput:
        import jax.numpy as jnp
        prompt, placeholder_values = self.build_prompt(frame)
        n_img = self.model_cfg.vit.tokens_per_patch_image * 2
        chat = tokenize_chat(self.tok, prompt, None, n_img)
        label = batch_language_label(
            [chat],
            [{self.tok.convert_tokens_to_ids(k): v
              for k, v in placeholder_values.items()}],
            self.tok.pad_token_id, self.max_prompt_len, pad_side="left")
        # raw uint8 frame; tiling/normalization happen on-device (see jit
        # wrappers in __init__)
        return DrivingInput(
            pixel_values=jnp.asarray(frame.rgb[None]),
            vehicle_speed=jnp.asarray([frame.speed], jnp.float32),
            target_point=jnp.asarray(frame.target_point[None], jnp.float32),
            prompt=label, prompt_inference=label)

    # ------------------------------------------------------------------
    def run_step(self, frame: AgentFrame) -> Dict[str, Any]:
        """One simulator tick -> control dict. Latency-instrumented."""
        t0 = time.perf_counter()
        self.step_count += 1

        if self.step_count <= self.cfg.initial_frames_delay:
            return {"steer": 0.0, "throttle": 0.0, "brake": True,
                    "route": np.zeros((20, 2)), "speed_wps": np.zeros((10, 2)),
                    "language": "", "latency_s": 0.0}

        if self.cfg.jpeg_roundtrip:
            import cv2
            ok, buf = cv2.imencode(".jpg", frame.rgb[:, :, ::-1])
            if ok:
                frame = dataclasses.replace(
                    frame, rgb=cv2.imdecode(buf, cv2.IMREAD_COLOR)[:, :, ::-1])

        di = self.make_input(frame)
        if self.cfg.use_cot:
            if self._draft_tables is not None:
                out, st = self._generate_spec(self.params, di,
                                              self._draft_tables)
                self.spec_stats.append((int(st["rounds"]),
                                        int(st["gen_len"])))
            else:
                out = self._generate(self.params, di)
        else:
            out = self._drive_only(self.params, di)
        route = np.asarray(out.route[0], np.float64)
        speed_wps = np.asarray(out.speed_wps[0], np.float64)
        language_tokens: List[int] = []
        if self.cfg.use_cot:
            n = int(out.language_lengths[0])
            language_tokens = [int(t) for t in
                               np.asarray(out.language_tokens[0][:n])]
            self.last_language = self.tok.decode(language_tokens)
            if self.cfg.speculative_cot and language_tokens:
                self._refresh_draft(language_tokens)

        steer, throttle, brake = self.controller.control_pid(
            route, float(frame.speed), speed_wps)

        # stuck detection + creep (reference :881-894)
        if float(frame.speed) < 0.1:
            self.stuck_count += 1
        else:
            self.stuck_count = 0
        if self.stuck_count > self.cfg.stuck_threshold:
            self.creep_remaining = self.cfg.creep_duration
            self.stuck_count = 0
        if self.creep_remaining > 0:
            self.creep_remaining -= 1
            throttle, brake = self.cfg.creep_throttle, False

        latency = time.perf_counter() - t0
        self.latencies.append(latency)
        self.last_control = (steer, throttle, brake)
        if self._metric_file is not None:
            import json
            self._metric_file.write(json.dumps({
                "step": self.step_count, "steer": steer,
                "throttle": throttle, "brake": brake,
                "speed": float(frame.speed), "latency_ms": latency * 1e3,
                "language": self.last_language,
            }) + "\n")
            self._metric_file.flush()
        return {
            "steer": steer, "throttle": throttle, "brake": brake,
            "route": route, "speed_wps": speed_wps,
            "language": self.last_language,
            "language_tokens": language_tokens,
            "latency_s": latency,
        }

    def latency_stats(self) -> Dict[str, float]:
        lat = np.asarray(self.latencies[1:] or self.latencies)  # drop compile
        return {"p50_ms": float(np.percentile(lat, 50) * 1e3),
                "p90_ms": float(np.percentile(lat, 90) * 1e3),
                "mean_ms": float(lat.mean() * 1e3)}
