"""Throughput benchmark: 16k-point KITTI cloud-pair registrations per second
on one chip, with the flagship DeepCLR model (bf16 compute).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star of >2000
pairs/s on a v5e-8, i.e. 250 pairs/s/chip (the reference publishes no
absolute GPU numbers — BASELINE.md).
"""
import json
import os
import subprocess
import sys
import time

BASELINE_PAIRS_PER_SEC_PER_CHIP = 250.0

# Device-readiness gate: when the TPU relay is unresponsive, ANY jax
# backend init in this environment hangs forever in a retry loop (even
# JAX_PLATFORMS=cpu — registering the relay plugin is enough).  Probe in
# short-lived subprocesses first so an outage surfaces as a bounded,
# explicit failure instead of a silent driver hang.  Tunables:
#   DEEPCLR_BENCH_PROBE_TIMEOUT  per-attempt seconds (default 300)
#   DEEPCLR_BENCH_PROBE_RETRIES  attempts (default 6, ~30 min total)


def _wait_for_devices() -> None:
    timeout = float(os.environ.get("DEEPCLR_BENCH_PROBE_TIMEOUT", "300"))
    retries = int(os.environ.get("DEEPCLR_BENCH_PROBE_RETRIES", "6"))
    last = None
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=timeout, capture_output=True, text=True,
                env=os.environ.copy(),
            )
            if proc.returncode == 0:
                return
            last = proc.stderr[-500:]
        except subprocess.TimeoutExpired:
            last = f"device probe timed out after {timeout:.0f}s"
        print(f"bench: device probe attempt {attempt + 1}/{retries} failed "
              f"({last})", file=sys.stderr, flush=True)
        if attempt + 1 < retries:
            time.sleep(30)
    print(json.dumps({
        "metric": "kitti_16k_pairs_per_sec_per_chip",
        "error": f"TPU backend unavailable after {retries} probe attempts "
                 f"(relay outage?): {last}",
    }))
    sys.exit(1)


_wait_for_devices()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from __graft_entry__ import KITTI_MODEL_CFG  # noqa: E402


def _kitti_like_clouds(batch, n, d, seed=0):
    """Synthetic clouds with KITTI-like spatial statistics (~120x120x8 m
    extent) so spatial culling behaves as it does on real scans."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(batch, n, 3)).astype(np.float32)
    pts *= np.array([30.0, 30.0, 2.0], np.float32)
    extra = rng.uniform(0.0, 1.0, size=(batch, n, d - 3)).astype(np.float32)
    return jnp.asarray(np.concatenate([pts, extra], axis=-1))


def main():
    from deepclr_tpu.models import build_model, init_params

    # batch 16 is the measured single-chip throughput sweet spot: the
    # batch sweep (docs/kernels.md) gives 753 / 813 / 806 pairs/s at
    # batch 8 / 16 / 32 — beyond 16 the fused-SA working set stops
    # amortizing dispatch overhead while FPS falls back to VMEM slices.
    batch, n = 16, 16384
    model = build_model(KITTI_MODEL_CFG)
    variables = init_params(model, jax.random.PRNGKey(0), num_points=n,
                            batch_size=batch)

    @jax.jit
    def forward(variables, template, source):
        y_pred, _ = model.apply(variables, template, source)
        return y_pred

    template = _kitti_like_clouds(batch, n, 4, seed=1)
    source = _kitti_like_clouds(batch, n, 4, seed=2)

    # warmup / compile (np.asarray forces a real device sync — on relayed
    # TPU backends block_until_ready returns before execution finishes)
    np.asarray(forward(variables, template, source))
    np.asarray(forward(variables, template, source))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(variables, template, source)
    np.asarray(out)
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * iters / dt

    # training throughput: fwd+bwd+loss on the same workload, reduced to
    # one scalar inside jit (raw gradient-pytree outputs would measure the
    # relay's per-buffer overhead, not the kernels — docs/roofline.md)
    from deepclr_tpu.geometry import LabelType
    from deepclr_tpu.losses import make_loss_fn

    loss_fn = make_loss_fn(
        [{"type": "trans", "weights": [1.0], "params": {"p": 2}},
         {"type": "rot", "weights": [200.0], "params": {"p": 2}}],
        LabelType.POSE3D_DUAL_QUAT,
    )
    m_id = np.tile(np.eye(4, dtype=np.float32), (batch, 1, 1))
    m_id[:, 0, 3] = 0.5
    y = jnp.asarray(LabelType.POSE3D_DUAL_QUAT.from_matrix(m_id), jnp.float32)

    @jax.jit
    def grad_step(params, template, source):
        def loss(p):
            y_pred, _ = model.apply({"params": p}, template, source)
            return jnp.sum(loss_fn(y_pred, y))
        val, grads = jax.value_and_grad(loss)(params)
        return val + sum(jnp.sum(g)
                         for g in jax.tree_util.tree_leaves(grads))

    params = variables["params"]
    np.asarray(grad_step(params, template, source))
    np.asarray(grad_step(params, template, source))
    t0 = time.perf_counter()
    for _ in range(iters):
        tout = grad_step(params, template, source)
    np.asarray(tout)
    train_pairs_per_sec = batch * iters / (time.perf_counter() - t0)

    # loader guardrail: the in-line host loader must outrun the device's
    # batch demand at the measured train-step time, or the chip starves
    # (docs/data.md — headroom was ~2x at r4 and shrinks as training gets
    # faster).  Tracked here so every BENCH_r*.json records the ratio.
    loader_rate = loader_headroom = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "scripts"))
        from bench_loader import build_pack, make_cfg, measure

        # 200 clouds -> ~199 sequential pairs -> 12 batches at batch 16
        # (one is eaten by measure()'s warmup; 8 are timed)
        pack = "/tmp/bench_guardrail.pack"
        if not os.path.exists(pack):
            build_pack(pack, clouds=200, raw_points=60000)
        cfg_l = make_cfg(pack, batch, n, 0, "thread", host_fps=False)
        loader_rate = measure(cfg_l, max_batches=8)
        if not loader_rate:
            raise RuntimeError("loader probe produced no batches "
                               "(pack too small for this batch size?)")
        demand_steps = train_pairs_per_sec / batch
        loader_headroom = loader_rate / demand_steps
    except Exception as e:  # never fail the bench on the guardrail probe
        print(f"bench: loader guardrail probe failed: {e}", file=sys.stderr)

    from deepclr_tpu.utils.flops import (
        mfu, model_flops_per_pair, peak_flops_per_chip,
    )
    print(json.dumps({
        "metric": "kitti_16k_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC_PER_CHIP, 3),
        # algorithmic-FLOPs utilization: delivered useful FLOP/s over the
        # chip's dense bf16 peak (deepclr_tpu/utils/flops.py; executed
        # FLOPs are higher — see docs/roofline.md)
        "mfu": round(mfu(pairs_per_sec, KITTI_MODEL_CFG, n), 4),
        "gflops_per_pair": round(
            model_flops_per_pair(KITTI_MODEL_CFG, n) / 1e9, 2),
        "peak_tflops": round(peak_flops_per_chip() / 1e12, 1),
        # fwd+bwd (training) rate on the same pairs
        "train_pairs_per_sec": round(train_pairs_per_sec, 2),
        "batch": batch,
        # host in-line loader batches/s and its ratio over device demand
        # (train steps/s); <1.0 means the host starves the chip
        "loader_batches_per_sec": (
            round(loader_rate, 2) if loader_rate else None),
        "loader_headroom": (
            round(loader_headroom, 2) if loader_headroom else None),
    }))


if __name__ == "__main__":
    main()
