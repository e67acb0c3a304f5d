"""Micro-profile of detect_grid_full's internal pieces on real frames.

profile_stages.py times perceive() prefixes; this drills into the
detection stage itself: blur+threshold, the bit-packed lattice bank, the
interior-line gates, and region isolation, each as its own pipelined
fetch-timed window on the real pooled golden frames (batch 32).

Usage:  python -m sudoku_vision_tpu.tools.profile_detect [batch]
"""

from __future__ import annotations

import glob
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from sudoku_vision_tpu.utils import jax_cache

jax_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.cv import grid as G


def _window(jf, arg, seconds=2.0, depth=10):
    """Pipelined fetch-timed window. depth sets the measurement floor:
    throughput can't read below round_trip_latency/depth even for
    near-free kernels (~25 ms tunnel round-trip / 10 ≈ 0.08 ms/frame
    at batch 32), so cheap stages need a deep pipeline."""
    np.asarray(jf(arg))
    best = None
    for _ in range(3):
        inflight = [jf(arg) for _ in range(depth)]
        for r in inflight:
            r.copy_to_host_async()
        t0 = time.perf_counter()
        iters = 0
        while time.perf_counter() - t0 < seconds or iters < 3:
            r = jf(arg)
            r.copy_to_host_async()
            inflight.append(r)
            np.asarray(inflight.pop(0))
            iters += 1
        for r in inflight:
            np.asarray(r)
            iters += 1
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


def main():
    from sudoku_vision_tpu.utils.imageio import load_bgr

    batch = int((sys.argv[1:] or [32])[0])
    paths = sorted(glob.glob("/root/repo/data/golden/sample_*.jpg"))
    frames = [load_bgr(p) for p in paths]
    shape = frames[0].shape
    frames = [f for f in frames if f.shape == shape]
    reps = -(-batch // len(frames))
    stack = jax.device_put(jnp.asarray(np.stack((frames * reps)[:batch])))

    gh, gw = shape[:2]
    ds0 = max(1, round(max(gh, gw) / 950))
    stack = stack.reshape(batch, gh, gw * 3)  # packed-BGR serving layout
    stack = jax.device_put(jnp.asarray(np.asarray(stack)))

    from sudoku_vision_tpu.ops.pallas_pool import pooled_gray_packed

    def pooled(imgs):
        return jax.vmap(lambda im: pooled_gray_packed(im, ds0))(imgs)

    small = jax.jit(pooled)(stack)
    small = jax.device_put(np.asarray(small))  # settle as concrete input
    print(f"batch={batch} frame={shape} small={small.shape}")

    def s(x):
        return sum(jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(x))

    def t(name, fn, arg):
        dt = _window(jax.jit(lambda a: s(fn(a))), arg)
        print(f"{name:22s} {dt / batch * 1e3:7.3f} ms/frame")

    from sudoku_vision_tpu.ops.filters import box_mean_u8, gaussian_blur_u8
    from sudoku_vision_tpu.ops.morphology import erode
    from sudoku_vision_tpu.ops.threshold import adaptive_threshold

    t("pooled_gray", pooled, stack)

    def binarize(sm):
        return jax.vmap(lambda x: adaptive_threshold(
            gaussian_blur_u8(x, 5), 11, 2, method="gaussian",
            invert=True))(sm)

    t("blur+threshold", binarize, small)
    binary = jax.device_put(np.asarray(jax.jit(binarize)(small)))

    def bank(b):
        return jax.vmap(lambda x: G.line_lattice_hv(x, 31))(b)

    t("lattice bank (packed)", bank, binary)

    def gates(sm):
        # The interior-line gate block from detect_grid_full, verbatim
        # shape/op structure (erode core + 12 shifted reads + symmetry +
        # two box-sum votes).
        def one(small):
            r = 1.0
            core = erode(small, 5)
            o1 = 3
            o2, o3 = 2 * o1, 3 * o1
            P = o3
            sh, sw = small.shape
            s8p = jnp.pad(small, P, constant_values=0)

            def _shifted(dy, dx):
                return s8p[P - dy:P - dy + sh, P - dx:P - dx + sw]

            def _side(dy, dx):
                return jnp.maximum(
                    jnp.maximum(_shifted(o1 * dy, o1 * dx),
                                _shifted(o2 * dy, o2 * dx)),
                    _shifted(o3 * dy, o3 * dx))

            side_u, side_d = _side(-1, 0), _side(1, 0)
            side_l, side_r = _side(0, -1), _side(0, 1)
            sym_ud = jnp.maximum(side_u, side_d) \
                - jnp.minimum(side_u, side_d) < jnp.uint8(45)
            sym_lr = jnp.maximum(side_l, side_r) \
                - jnp.minimum(side_l, side_r) < jnp.uint8(45)
            core_m = jnp.minimum(core, jnp.uint8(235)) + jnp.uint8(20)
            gate_h = jnp.logical_and(
                jnp.minimum(side_u, side_d) > core_m, sym_ud)
            gate_v = jnp.logical_and(
                jnp.minimum(side_l, side_r) > core_m, sym_lr)
            kg = 9
            tg = jnp.uint8(math.ceil(6.0 - 1e-6))
            gate_h = G._box_sum_u8(gate_h, kg) >= tg
            gate_v = G._box_sum_u8(gate_v, kg) >= tg
            return gate_h, gate_v

        return jax.vmap(one)(sm)

    t("interior-line gates", gates, small)

    def darkhalf(sm):
        def one(small):
            core = erode(small, 5)

            def _pool2_min(x):
                xh, xw = x.shape
                return jax.lax.reduce_window(
                    x[:xh - (xh % 2), :xw - (xw % 2)], jnp.uint8(255),
                    jax.lax.min, (2, 2), (2, 2), "VALID")

            small2 = jnp.clip(jnp.rint(G._avg_pool(small, 2)),
                              0, 255).astype(jnp.uint8)
            core2 = _pool2_min(core)
            mean2 = box_mean_u8(small2, 15)
            sh2 = min(core2.shape[0], mean2.shape[0])
            sw2 = min(core2.shape[1], mean2.shape[1])
            return (jnp.minimum(core2[:sh2, :sw2], jnp.uint8(225))
                    + jnp.uint8(30) < mean2[:sh2, :sw2])

        return jax.vmap(one)(sm)

    t("half-res dark gate", darkhalf, small)

    lat_h, lat_v = jax.jit(bank)(binary)
    lat_h2 = jax.device_put(np.asarray(jax.jit(jax.vmap(
        lambda x: jax.lax.reduce_window(
            x[:x.shape[0] // 2 * 2, :x.shape[1] // 2 * 2], x.dtype.type(0),
            jax.lax.max, (2, 2), (2, 2), "VALID")))(lat_h)))
    lat_v2 = jax.device_put(np.asarray(jax.jit(jax.vmap(
        lambda x: jax.lax.reduce_window(
            x[:x.shape[0] // 2 * 2, :x.shape[1] // 2 * 2], x.dtype.type(0),
            jax.lax.max, (2, 2), (2, 2), "VALID")))(lat_v)))

    def region(pair):
        lh, lv = pair
        return jax.vmap(lambda a, b: G.grid_region_from_lattice(
            a, b, 31, scale=0.5))(lh, lv)

    t("region isolation (1/2)", region, (lat_h2, lat_v2))

    def full(imgs):
        return jax.vmap(lambda im: G.detect_grid_full(
            pooled_gray_packed(im, ds0))[0].corners)(imgs)

    t("detect_grid_full e2e", full, stack)
    return 0


if __name__ == "__main__":
    sys.exit(main())
