"""Training loop: data prefetch, pjit step, logging, checkpoint/resume.

Counterpart of the reference training runtime (train.py + Lightning +
DeepSpeed, SURVEY.md section 2.4), re-designed for TPU:

  * one jit-compiled train step (fwd+bwd+update) fed by a host-side
    prefetch thread pool (the reference uses torch DataLoader workers);
  * deterministic resumable data order: the sampler is a pure function of
    (seed, step), so resume restores exact data order from the step counter;
  * orbax checkpoints of the full sharded state; metrics logged via a
    pluggable logger (JSONL file by default, wandb if available/configured).
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.core import checkpoint as ckpt
from simlingo_tpu.core.config import TrainConfig, to_dict
from simlingo_tpu.data.collate import CollateConfig, collate
from simlingo_tpu.data.driving_dataset import DrivingDataset
from simlingo_tpu.data.sampler import Bucket, WeightedBucketSampler
from simlingo_tpu.data.tokenizer import SimLingoTokenizer
from simlingo_tpu.models import simlingo
from simlingo_tpu.parallel import mesh as meshlib
from simlingo_tpu.parallel import pipeline, sequence
from simlingo_tpu.train import train_step as ts


def _dump_git_state(run_dir: str) -> None:
    """Record the code state (reference utils/logging_project.py:16-67)."""
    import subprocess
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], text=True,
                             capture_output=True, timeout=10).stdout.strip()
        diff = subprocess.run(["git", "diff"], text=True,
                              capture_output=True, timeout=10).stdout
        with open(os.path.join(run_dir, "git_state.txt"), "w") as f:
            f.write(f"sha: {sha}\n\n{diff}")
    except Exception:
        pass


class JsonlLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.f = open(path, "a")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self.f.write(json.dumps({"step": step, **metrics}) + "\n")
        self.f.flush()

    def log_image(self, name: str, step: int, image) -> None:
        # images live on disk (the visualise callback saves PNGs); record
        # the event so runs are greppable for when visuals were produced
        self.f.write(json.dumps({"step": step, "image": name}) + "\n")
        self.f.flush()


class WandbLogger:
    """Optional wandb sink (reference train.py:148-157); activated when the
    wandb package is importable and WANDB_MODE is not 'disabled'."""

    def __init__(self, name: str, config: Dict[str, Any]):
        import wandb
        self.run = wandb.init(project=os.environ.get(
            "WANDB_PROJECT", "simlingo_tpu"), name=name, config=config,
            resume="allow")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self.run.log(metrics, step=step)

    def log_image(self, name: str, step: int, image) -> None:
        """Image upload (reference VisualiseCallback logs via
        `pl_module.logger.log_image`)."""
        import wandb
        self.run.log({name: wandb.Image(image)}, step=step)


class MultiLogger:
    def __init__(self, loggers):
        self.loggers = loggers

    def log(self, step, metrics):
        for lg in self.loggers:
            lg.log(step, metrics)

    def log_image(self, name, step, image):
        for lg in self.loggers:
            if hasattr(lg, "log_image"):
                lg.log_image(name, step, image)


def make_logger(run_dir: str, name: str, config: Dict[str, Any]):
    loggers = [JsonlLogger(os.path.join(run_dir, "metrics.jsonl"))]
    if os.environ.get("WANDB_MODE", "disabled") != "disabled":
        try:
            loggers.append(WandbLogger(name, config))
        except Exception as e:
            print(f"wandb disabled: {e}")
    return MultiLogger(loggers)


class Prefetcher:
    """Thread-pool prefetch: sampler step -> collated device batch."""

    def __init__(self, make_batch: Callable[[int], Any], start_step: int,
                 num_workers: int = 4, depth: int = 4):
        self.make_batch = make_batch
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.next_step = start_step
        self.lock = threading.Lock()
        self.stop = threading.Event()
        self.threads = [threading.Thread(target=self._worker, daemon=True)
                        for _ in range(num_workers)]
        self.results: Dict[int, Any] = {}
        self.cv = threading.Condition()
        for t in self.threads:
            t.start()

    def _worker(self):
        while not self.stop.is_set():
            with self.lock:
                step = self.next_step
                self.next_step += 1
            try:
                batch = self.make_batch(step)
            except Exception as e:  # surface errors to the consumer
                batch = e
            with self.cv:
                self.results[step] = batch
                self.cv.notify_all()
            # bound memory: wait until consumed if we are far ahead
            while len(self.results) > 2 * len(self.threads) \
                    and not self.stop.is_set():
                time.sleep(0.005)

    def get(self, step: int) -> Any:
        with self.cv:
            while step not in self.results:
                self.cv.wait(timeout=1.0)
            batch = self.results.pop(step)
        if isinstance(batch, Exception):
            raise batch
        return batch

    def close(self):
        self.stop.set()


def build_buckets(cfg: TrainConfig) -> List[tuple]:
    """[(bucket, dataset)] honoring train_partitions (+ dreamer mix)."""
    from simlingo_tpu.data.dreamer_dataset import (DreamerDataset,
                                                   DreamerDatasetConfig)
    base = dataclasses.replace(cfg.data.base, data_root=cfg.data.data_root,
                               bucket_path=cfg.data.bucket_path)
    driving: Dict[str, tuple] = {}
    partitions = cfg.data.train_partitions or {"all": 1.0}
    for name, weight in partitions.items():
        d = DrivingDataset(dataclasses.replace(base, bucket_name=name))
        driving[name] = (d, weight)
    dreamer: Dict[str, tuple] = {}
    if cfg.data.use_dreamer:
        dpart = cfg.data.train_partitions_dreamer or {"all": 1.0}
        for name, weight in dpart.items():
            d = DreamerDataset(DreamerDatasetConfig(
                **{f.name: getattr(base, f.name)
                   for f in dataclasses.fields(base)}))
            dreamer[name] = (d, weight)

    buckets: List[Bucket] = []
    datasets: List[Any] = []
    drv = {n: (len(d), w) for n, (d, w) in driving.items() if len(d) > 0}
    drm = {n: (len(d), w) for n, (d, w) in dreamer.items() if len(d) > 0}
    from simlingo_tpu.data.sampler import normalize_buckets
    norm = normalize_buckets(drv, drm if drm else None)
    by_name = {**{n: d for n, (d, _) in driving.items()},
               **{f"{n}_dreamer": d for n, (d, _) in dreamer.items()}}
    for b in norm:
        buckets.append(b)
        datasets.append(by_name[b.name])
    return buckets, datasets


def train(cfg: TrainConfig,
          make_synthetic: bool = False) -> Dict[str, Any]:
    """Run training. With make_synthetic=True, trains on synthetic batches
    (no dataset on disk required) -- used for benchmarking and smoke runs."""
    try:
        return _train_impl(cfg, make_synthetic)
    finally:
        sequence.disable()      # never leak the sp context past train()
        pipeline.disable()      # ... nor the pp context


def _print_model_summary(params, mask_tree) -> None:
    """Per-tower parameter counts incl. trainable split (the reference's
    ModelSummary(max_depth=3) callback, train.py:184)."""
    rows = []
    total = total_t = 0
    for name, sub in sorted(params.items()):
        leaves = jax.tree_util.tree_leaves(sub)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        m_leaves = jax.tree_util.tree_leaves(
            mask_tree[name] if isinstance(mask_tree, dict) else mask_tree)
        n_t = sum(int(np.prod(l.shape))
                  for l, t in zip(leaves, m_leaves) if t)
        rows.append((name, n, n_t))
        total += n
        total_t += n_t
    width = max(len(r[0]) for r in rows) if rows else 5
    print("model summary (params / trainable):")
    for name, n, n_t in rows:
        print(f"  {name:<{width}}  {n / 1e6:9.2f} M  {n_t / 1e6:9.2f} M")
    print(f"  {'total':<{width}}  {total / 1e6:9.2f} M  "
          f"{total_t / 1e6:9.2f} M")


def _train_impl(cfg: TrainConfig,
                make_synthetic: bool = False) -> Dict[str, Any]:
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    np.random.seed(cfg.seed)

    mesh = meshlib.make_mesh(cfg.mesh.dp, cfg.mesh.fsdp, cfg.mesh.tp,
                             getattr(cfg.mesh, "sp", 1),
                             getattr(cfg.mesh, "pp", 1))
    # sp > 1: eligible attention calls trace through ring attention with the
    # sequence dim sharded (parallel/sequence.py). Scoped via try/finally
    # (see the matching `finally` at the end of this function): the context
    # must cover the train-step trace but MUST NOT leak past train() --
    # a later single-device jit in the same process would otherwise try to
    # partition over a mesh it doesn't run on.
    sequence.enable(mesh)
    # pp > 1: the LLM decoder runs as a GPipe pipeline over pp-sharded
    # stacked layer params (parallel/pipeline.py); the stacking itself
    # happens right after param init below.
    pipeline.enable(mesh, microbatches=getattr(cfg.mesh, "pp_microbatches", 0))
    compute_dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32

    # ---- params ----
    model_cfg = cfg.model
    if cfg.hf_checkpoint:
        params = ckpt.load_hf_checkpoint(cfg.hf_checkpoint, model_cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        if model_cfg.llm.lora_r > 0:
            from simlingo_tpu.models import qwen2
            params["lora"] = qwen2.init_lora_params(
                jax.random.PRNGKey(cfg.seed), model_cfg.llm)
    else:
        params = simlingo.init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    if mesh.shape["pp"] > 1:
        # pp layout: LLM (and LoRA) layer params restacked with a leading
        # layer dim sharded over pp -- each stage holds only its block of
        # layers at rest (mesh.py stacked partition rules)
        params["llm"] = dict(params["llm"], layers=pipeline.stack_layer_tree(
            params["llm"]["layers"]))
        if "lora" in params:
            params["lora"] = dict(
                params["lora"],
                layers=pipeline.stack_layer_tree(params["lora"]["layers"]))
    params = meshlib.shard_params(params, mesh)

    mask = ts.trainable_mask(params, ts.production_trainable)
    _print_model_summary(params, mask)
    lr_schedule = ts.onecycle_schedule(cfg.optimizer)
    opt = ts.make_masked_optimizer(cfg.optimizer, mask)
    state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
    # place every remaining single-device leaf (optimizer counters, step) on
    # the mesh replicated, so the whole state has a consistent device set
    # (required for jit with explicitly-sharded inputs and for restore)
    from jax.sharding import NamedSharding, PartitionSpec
    rep = NamedSharding(mesh, PartitionSpec())
    state = jax.tree_util.tree_map(
        lambda x: x if isinstance(getattr(x, "sharding", None), NamedSharding)
        else jax.device_put(x, rep), state)
    step_fn = ts.make_train_step(model_cfg, opt, compute_dtype=compute_dtype,
                                 trainable_mask_tree=mask, donate=True)

    run_dir = os.path.join(cfg.output_dir, cfg.name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(run_dir, exist_ok=True)
    # host-side run artifacts are primary-only on multi-host (checkpoint
    # saves below stay on every process -- orbax writes are collective)
    from simlingo_tpu.parallel.multihost import is_primary
    if is_primary():
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(to_dict(cfg), f, indent=2, default=str)
        _dump_git_state(run_dir)
        logger = make_logger(run_dir, cfg.name, to_dict(cfg))
    else:
        logger = MultiLogger([])

    start_step = 0
    if cfg.resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            start_step = int(jax.device_get(state["step"]))
            print(f"resumed from {latest} at step {start_step}")

    # ---- data ----
    batch_size = cfg.data.batch_size
    if make_synthetic:
        from simlingo_tpu.data.synthetic import synthetic_example
        base_ex = synthetic_example(model_cfg, batch=batch_size,
                                    seq_len=cfg.data.max_text_len,
                                    num_patches=2)

        def make_batch(step):
            return base_ex
        total_steps = cfg.max_steps if cfg.max_steps > 0 else 100
    else:
        tok = SimLingoTokenizer(cfg.tokenizer_path)
        buckets, datasets = build_buckets(cfg)
        sampler = WeightedBucketSampler(buckets, seed=cfg.seed)
        n_img_tokens = (model_cfg.vit.tokens_per_patch_image
                        * cfg.data.base.max_num_grid)
        ccfg = CollateConfig(max_text_len=cfg.data.max_text_len,
                             num_image_tokens=n_img_tokens)
        # multi-host: batch_size is PER PROCESS (Lightning per-GPU
        # semantics); the global batch is batch_size * process_count, and
        # every host loads a disjoint slice of the same deterministic pick
        # sequence (resume-safe: picks depend only on step)
        pc, pi = jax.process_count(), jax.process_index()
        steps_per_epoch = max(1, sampler.num_samples // (batch_size * pc))
        total_steps = (cfg.max_steps if cfg.max_steps > 0
                       else steps_per_epoch * cfg.max_epochs)

        def make_batch(step):
            picks = sampler.batch_at(step, batch_size * pc)[
                pi * batch_size:(pi + 1) * batch_size]
            rng = np.random.RandomState(cfg.seed * 7919 + step * pc + pi)
            samples = [datasets[b].get(i, rng) for b, i in picks]
            # strip per-batch static metadata: it lives in the treedef and
            # would force a recompile of the train step every batch
            ex = collate(samples, tok, ccfg).strip_static()
            return meshlib.put_batch(ex, mesh)

    # ---- validation split (reference driving.py:274 validation_step over
    # datamodule.py:297 val_dataloader, run every check_val_every_n_epoch;
    # here: the routes_validation split, augmentations off) ----
    val_ds = None
    val_interval = 0
    if not make_synthetic and cfg.val_every_n_epochs > 0:
        from simlingo_tpu.data.driving_dataset import DrivingDataset
        vbase = dataclasses.replace(
            cfg.data.base, data_root=cfg.data.data_root, split="val",
            bucket_name="all", bucket_path=None,
            commentary_augmentation=False, qa_augmentation=False,
            img_shift_augmentation=False, img_augmentation=False)
        val_ds = DrivingDataset(vbase)
        if len(val_ds) >= batch_size:
            val_interval = steps_per_epoch * cfg.val_every_n_epochs
        else:
            val_ds = None

    prefetch = Prefetcher(make_batch, start_step,
                          num_workers=max(1, cfg.data.num_workers))

    from simlingo_tpu.train.visualise import VisualiseCallback
    viz = VisualiseCallback(cfg.visualise_every_n_steps,
                            os.path.join(run_dir, "viz"),
                            logger=logger,
                            tokenizer=None if make_synthetic else tok)
    eval_step = ts.make_eval_step(model_cfg, compute_dtype=compute_dtype) \
        if cfg.visualise_every_n_steps > 0 or val_ds is not None else None

    def run_validation(state) -> Dict[str, float]:
        """Mean forward-loss metrics over the val split (no grads, no aug),
        the epoch-aggregated val/loss of the reference's validation_step."""
        gbs = batch_size * pc                     # global validation batch
        n_batches = len(val_ds) // gbs
        if cfg.val_max_batches > 0:
            n_batches = min(n_batches, cfg.val_max_batches)
        sums: Dict[str, float] = {}
        for bi in range(n_batches):
            rng_v = np.random.RandomState(9973 + bi)   # augmentations are off
            samples = [val_ds.get(bi * gbs + pi * batch_size + j, rng_v)
                       for j in range(batch_size)]
            ex = collate(samples, tok, ccfg).strip_static()
            ex = meshlib.put_batch(ex, mesh)
            metrics, _ = eval_step(state["params"], ex)
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(jax.device_get(v))
        return {f"val_{k}": v / max(n_batches, 1) for k, v in sums.items()}

    # ---- loop ----
    rng = jax.random.PRNGKey(cfg.seed)
    last_metrics: Dict[str, float] = {}
    t_log = time.perf_counter()
    try:
        for step in range(start_step, total_steps):
            batch = prefetch.get(step)
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step))
            if step == start_step and sequence.active_axis() is not None \
                    and sequence.trace_count() == 0:
                # sp was configured but every attention call fell back to the
                # single-chip kernels (e.g. indivisible sequence length):
                # activations stay replicated over the sp axis, which defeats
                # the memory sharding sp was set up for -- fail loudly
                raise RuntimeError(
                    f"mesh.sp={mesh.shape['sp']} but no attention call "
                    "ring-routed in the traced step; check that the LLM "
                    "sequence length divides sp "
                    "(parallel/sequence.py dispatch rules)")
            if step == start_step and pipeline.active_axis() is not None \
                    and pipeline.trace_count() == 0:
                # pp was configured but the decoder never routed through the
                # pipeline (e.g. params were not restacked): every stage
                # would replicate all layers, defeating pp entirely
                raise RuntimeError(
                    f"mesh.pp={mesh.shape['pp']} but the traced step never "
                    "entered the layer pipeline; the LLM layer params must "
                    "use the stacked layout (parallel/pipeline.py)")
            if step == start_step or (cfg.log_every_n_steps > 0 and
                                      (step + 1) % cfg.log_every_n_steps == 0):
                host = {k: float(jax.device_get(v))
                        for k, v in metrics.items()}
                dt = time.perf_counter() - t_log
                n = cfg.log_every_n_steps if step != start_step else 1
                host["samples_per_sec"] = batch_size * n / dt
                # LearningRateMonitor analog: the schedule is a pure
                # function of the step, evaluated host-side
                host["lr"] = float(lr_schedule(step))
                t_log = time.perf_counter()
                logger.log(step + 1, host)
                last_metrics = host
                print(f"step {step + 1}/{total_steps} "
                      f"loss={host['loss']:.4f} "
                      f"{host['samples_per_sec']:.2f} samples/s")
            if cfg.checkpoint_every_n_steps > 0 \
                    and (step + 1) % cfg.checkpoint_every_n_steps == 0:
                # async: the disk write overlaps the next steps (orbax
                # copies device->host inside save, so donation is safe)
                ckpt.save_checkpoint(ckpt_dir, state, step + 1,
                                     keep=cfg.keep_checkpoints, block=False)
            if eval_step is not None and viz.every > 0 \
                    and (step + 1) % viz.every == 0:
                try:
                    _, preds = eval_step(state["params"], batch)
                    viz.maybe_plot(step + 1, batch, preds)
                except Exception as e:   # visualisation must never kill a run
                    print(f"visualise failed: {e}")
            if val_ds is not None and (
                    (val_interval > 0 and (step + 1) % val_interval == 0)
                    or step + 1 == total_steps):
                vm = run_validation(state)
                logger.log(step + 1, vm)
                last_metrics.update(vm)
                print(f"step {step + 1}: val_loss={vm['val_loss']:.4f} "
                      f"({len(val_ds)} val samples)")
    finally:
        prefetch.close()

    try:
        ckpt.save_checkpoint(ckpt_dir, state, total_steps,
                             keep=cfg.keep_checkpoints)
    except Exception as e:  # noqa: BLE001 -- deliberate: see message
        # A failed final disk write (flaky orbax/tensorstore finalize,
        # full disk) must not destroy the completed training run: the
        # state is in memory and the caller can re-save. Loud, not silent.
        print(f"WARNING: final checkpoint save failed after retry: {e!r}; "
              f"returning in-memory state (re-save with "
              f"core.checkpoint.save_checkpoint)", flush=True)
        last_metrics["final_checkpoint_error"] = repr(e)
    return {"state": state, "metrics": last_metrics,
            "total_steps": total_steps}
