"""Per-stage pipeline benchmark CLI.

Capability parity with reference pipeline/benchmark.py: run the pipeline
over all golden test images, report per-stage average timings and success
rate (:18). Extends the reference with a batched-throughput mode (the
TPU's real serving shape) and steady-state measurement separated from
compile time.

CLI:
    python -m sudoku_vision_tpu.pipeline.benchmark [--images DIR] [--batch N]
"""

from __future__ import annotations

import argparse
import glob
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="pipeline benchmark")
    p.add_argument("--images",
                   default="data/golden")
    p.add_argument("--batch", type=int, default=0,
                   help="also measure batched throughput with this batch")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    paths = sorted(glob.glob(f"{args.images}/*.jpg"))
    config = PipelineConfig(check_quality=False)
    rows = []
    for path in paths:
        # First call compiles; run twice and report the steady-state one.
        run_pipeline(path, config)
        res = run_pipeline(path, config)
        rows.append((path.rsplit("/", 1)[-1], res))
    print(f"{'image':<16}{'status':<16}{'graph ms':>10}{'reason ms':>10}"
          f"{'solve ms':>10}{'total ms':>10}")
    for name, res in rows:
        print(f"{name:<16}{res.status:<16}{res.time_graph * 1e3:>10.1f}"
              f"{res.time_reasoning * 1e3:>10.1f}"
              f"{res.time_solver * 1e3:>10.2f}"
              f"{res.time_total * 1e3:>10.1f}")
    ok = sum(1 for _, r in rows if r.success)
    avg = np.mean([r.time_graph for _, r in rows]) * 1e3
    print(f"success {ok}/{len(rows)}; avg steady-state graph {avg:.1f} ms")

    if args.batch:
        import jax
        import jax.numpy as jnp

        from sudoku_vision_tpu.ml import checkpoint as ckpt
        from sudoku_vision_tpu.models import DigitCNNv3
        from sudoku_vision_tpu.pipeline.graph import perceive
        from sudoku_vision_tpu.utils.imageio import load_bgr

        frames = [load_bgr(p) for p in paths]
        shape = frames[0].shape
        frames = [f for f in frames if f.shape == shape]
        reps = -(-args.batch // len(frames))
        host = np.stack((frames * reps)[:args.batch])
        b, fh, fw = host.shape[:3]
        stack = jnp.asarray(host.reshape(b, fh, fw * 3))  # packed BGR
        model = DigitCNNv3()
        variables = ckpt.load_variables_or_none("digit_cnn_v3")

        @jax.jit
        def fn(imgs):
            out = jax.vmap(lambda im: perceive(
                im, model, variables, packed_bgr=True))(imgs)
            return out.digits

        # Fetch-timed: block_until_ready is a no-op through the axon
        # tunnel, so pull the digits to host each iteration.
        np.asarray(fn(stack))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(fn(stack))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"batched: {args.batch} frames in {dt * 1e3:.1f} ms "
              f"-> {args.batch / dt:.1f} fps")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
