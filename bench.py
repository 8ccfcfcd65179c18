"""Benchmark: rays/sec/chip, forward+backward, flagship adaptive renderer.

Runs the full fused training step (encode 128x128 source view -> adaptive
LSTM-march render -> loss -> grads -> Adam update) on whatever accelerator
JAX exposes and reports sustained rays/second — the north-star metric from
BASELINE.md.  The reference publishes no numbers (BASELINE.json
``published: {}``), so ``vs_baseline`` is the ratio against the previous
recorded run of *this* benchmark when available (``BENCH_BASELINE.json``),
else 1.0.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: repeat bench runs skip the ~2-3 min compile
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def main():
    import jax

    # BENCH_PLATFORM=cpu for smoke tests: the environment's sitecustomize
    # pins the axon TPU plugin, so the env var alone doesn't stick — the
    # config update below does (same trick as tests/conftest.py).
    plat = os.environ.get("BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    import jax.numpy as jnp
    import optax

    from avr_tpu.config import parse_conf
    from avr_tpu.models.pixelnerf import ModelConfig
    from avr_tpu.models.wrapper import RadFieldRenderer
    from avr_tpu.renderers.base import (
        AdaptiveRendererConfig, RaymarcherConfig, VolumeRendererConfig,
    )
    from avr_tpu.training import LossParams, create_train_state, make_train_step

    # Workload: reference default train shapes (train.py:188-219) with the
    # ray batch scaled up to fill the chip (rays/s is per-ray normalized).
    # BENCH_RENDERER selects the renderer at the reference's own budgets:
    #   avr (default) - adaptive: 10 LSTM probes + 20 band samples
    #   vr            - classic:  64 coarse + (16+16) fine (renderers.py:257-264)
    #   raymarcher    - LSTM march only (coarse loss)
    SB = int(os.environ.get("BENCH_SB", 4))
    NS = int(os.environ.get("BENCH_NS", 1))
    SIDE = int(os.environ.get("BENCH_SIDE", 128))
    R = int(os.environ.get("BENCH_RAYS", 4096))
    WARMUP = int(os.environ.get("BENCH_WARMUP", 3))
    # >=50 iters: through the TPU relay, 10-iter timings under-measure by
    # ~4% of fixed-cost noise (219.6k at 10 iters vs 227.7k at 60 on the
    # same build — PERF.md round 4; the A/B harnesses learned this in
    # round 2)
    ITERS = int(os.environ.get("BENCH_ITERS", 60))
    RENDERER = os.environ.get("BENCH_RENDERER", "avr")

    DTYPE = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    # TPU-native RNG (matches the train CLI's default --prng_impl=rbg):
    # threefry's counter math costs ~2 ms/step at these shapes (PERF.md).
    jax.config.update(
        "jax_default_prng_impl", os.environ.get("BENCH_PRNG", "rbg")
    )

    conf = parse_conf(os.path.join(os.path.dirname(__file__), "conf", "default_mv.conf"))
    import dataclasses

    model_cfg = ModelConfig.from_conf(conf["model"])
    gather = os.environ.get("BENCH_GATHER", "auto")
    fused = os.environ.get("BENCH_FUSED_MLP", "auto")
    model_cfg = dataclasses.replace(model_cfg, gather_impl=gather, fused_mlp=fused)
    if RENDERER == "vr":
        renderer_cfg = VolumeRendererConfig.from_conf(conf["normal_renderer"])
        loss_mode = "both"
    elif RENDERER == "raymarcher":
        renderer_cfg = RaymarcherConfig.from_conf(conf["raymarcher"])
        loss_mode = "coarse"
    else:
        renderer_cfg = AdaptiveRendererConfig.from_conf(conf["adaptive_renderer"])
        loss_mode = "both"
    # BENCH_EARLY_STOP=<eps>: per-block march early termination inside the
    # fused kernel (BASELINE config 4, adaptive sample budget).  0 = off.
    es = float(os.environ.get("BENCH_EARLY_STOP", "0"))
    if es > 0 and hasattr(renderer_cfg, "early_stop_eps"):
        renderer_cfg = dataclasses.replace(renderer_cfg, early_stop_eps=es)
    model = RadFieldRenderer(
        model_cfg=model_cfg,
        renderer_cfg=renderer_cfg,
        dtype=DTYPE,
        remat_field=os.environ.get("BENCH_REMAT", "0") == "1",
        fused_march=os.environ.get("BENCH_FUSED_MARCH", "auto"),
        # default "never": the fused band integral measured ~4 ms/step
        # SLOWER than XLA's own integral fusions even after the round-3
        # point-major rewrite removed the relayout (PERF.md round 3)
        fused_integral=os.environ.get("BENCH_FUSED_INTEGRAL", "never"),
    )

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(SB, NS, SIDE, SIDE, 3)).astype(np.float32))
    c2w = np.eye(4, dtype=np.float32) @ np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    c2w[2, 3] = 1.3
    poses = jnp.asarray(np.broadcast_to(c2w, (SB, NS, 4, 4)).copy())
    focal = jnp.float32(1.09375 * SIDE)
    c = jnp.asarray([SIDE / 2.0, SIDE / 2.0], jnp.float32)
    xy = jnp.asarray(rng.uniform(0.05, 0.95, size=(SB, R, 2)).astype(np.float32))
    K = jnp.broadcast_to(
        jnp.asarray([[1.09375, 0, 0.5], [0, 1.09375, 0.5], [0, 0, 1]], jnp.float32),
        (SB, 3, 3),
    )
    rays_c2w = jnp.broadcast_to(jnp.asarray(c2w), (SB, R, 4, 4))
    gt = jnp.asarray(rng.uniform(size=(SB, R, 3)).astype(np.float32))
    model_input = {"x_pix": xy, "cam2world": rays_c2w, "intrinsics": K}

    variables = model.init(
        jax.random.PRNGKey(0), images, poses, focal, c, method=model.init_all
    )
    # production optimizer: Adam + non-finite-update skip (make_optimizer);
    # BENCH_SAFE_OPT=0 reverts to plain Adam for costing the skip machinery
    from avr_tpu.training import make_optimizer
    tx = make_optimizer(
        1e-4, skip_nonfinite=os.environ.get("BENCH_SAFE_OPT", "1") != "0"
    )
    state = create_train_state(variables, tx)
    # BENCH_RAY_CHUNKS=N: gradient accumulation over N sequential ray
    # chunks.  BENCH_STEP=calls uses the N+2-dispatch variant
    # (make_chunked_call_train_step) whose small programs sidestep the
    # monolithic scan program's pathological Mosaic compile through the
    # relay and bound the stash at points/N (VR's route into the stash
    # backward).
    # VR defaults to the chunked-call step at 8 chunks: measured 26.1k vs
    # the monolithic step's 25.3k rays/s (logs/r4_vr_chunks.log) AND it
    # cold-compiles in ~2 min instead of the monolithic program's ~20 min
    # through the relay — each of the N+2 sub-programs is normal-sized.
    vr = RENDERER == "vr"
    chunks = int(os.environ.get("BENCH_RAY_CHUNKS", "8" if vr else "1"))
    # BENCH_RNG_MODE=per_ray: the sharding-invariant counter-hash sampler
    # RNG (hashrng.py) instead of the per-step-key streams
    rng_mode = os.environ.get("BENCH_RNG_MODE", "per_ray")
    if os.environ.get("BENCH_STEP", "calls" if vr else "fused") == "calls":
        from avr_tpu.training import make_chunked_call_train_step

        step = make_chunked_call_train_step(
            model, tx, LossParams(loss_mode=loss_mode), ray_chunks=chunks,
            rng_mode=rng_mode,
        )
    else:
        step = make_train_step(
            model, tx, LossParams(loss_mode=loss_mode), ray_chunks=chunks,
            rng_mode=rng_mode,
        )

    key = jax.random.PRNGKey(0)
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images, poses, focal, c, model_input, gt, sub)
    # Force real completion with a value fetch: through the remote TPU relay
    # in this environment, block_until_ready alone can return early.
    float(np.asarray(metrics["loss"]))

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images, poses, focal, c, model_input, gt, sub)
    float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0

    rays_per_s = SB * R * ITERS / dt

    # Whole-step MFU (verdict r4 task 8): model flops from the HLO flop
    # count of an XLA-only twin of the same step (gather_impl=xla,
    # fused_mlp/march/integral off), lowered but never compiled.  The twin
    # counts the *algorithm's* flops — XLA counts its gathers as ~0, so
    # none of the Pallas one-hot-contraction implementation flops are
    # claimed as useful work; the unfused autodiff backward has the same
    # minimal-flop dgrad+wgrad structure as the stash kernel.  Peak is the
    # chip's bf16 peak (v5e ~197 TFLOP/s, PERF.md roofline); override with
    # BENCH_PEAK_TFLOPS for other chips.  BENCH_MFU=0 skips the analysis.
    mfu = None
    step_tflops = None
    if os.environ.get("BENCH_MFU", "1") != "0":
        try:
            peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
            twin_cfg = dataclasses.replace(
                model_cfg, gather_impl="xla", fused_mlp="never"
            )
            twin = RadFieldRenderer(
                model_cfg=twin_cfg,
                renderer_cfg=renderer_cfg,
                dtype=DTYPE,
                fused_march="never",
                fused_integral="never",
            )
            tstep = make_train_step(
                twin, tx, LossParams(loss_mode=loss_mode), donate=False,
                rng_mode=rng_mode,
            )
            ca = tstep.lower(
                state, images, poses, focal, c, model_input, gt, key
            ).cost_analysis()
            if ca and ca.get("flops"):
                step_tflops = float(ca["flops"]) / 1e12
                mfu = step_tflops / (dt / ITERS) / peak
        except Exception as e:  # MFU is reporting, never a bench failure
            print(f"# mfu analysis skipped: {e}", file=sys.stderr)

    names = {
        "avr": "adaptive_render_train_rays_per_sec_per_chip",
        "vr": "volume_render_train_rays_per_sec_per_chip",
        "raymarcher": "raymarch_train_rays_per_sec_per_chip",
    }
    metric = names.get(RENDERER, names["avr"])
    if NS > 1:
        metric += f"_ns{NS}"

    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    vs = 1.0
    if os.path.exists(base_path):
        try:
            with open(base_path) as f:
                prev = json.load(f)
            # only ratio against a baseline of the same metric
            if prev.get("value") and prev.get("metric", metric) == metric:
                vs = rays_per_s / float(prev["value"])
        except Exception:
            pass

    out = {
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs, 4),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["step_tflops"] = round(step_tflops, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
