"""Multi-chip perception: the fused perceive graph sharded over a mesh.

This is the serving-side half of the "distributed backend" slot the
reference lacks (SURVEY.md §2.10/§7.6): frames are sharded along the
"data" mesh axis, model params are replicated (or tensor-parallel over
"model" via mesh.py's rules), and XLA partitions the whole
frame -> 81-digit graph so each chip perceives its own shard — the only
cross-chip traffic is at the program edges. Scaling recipe per the
public scaling-book: pick a mesh, annotate shardings with NamedSharding,
let XLA insert collectives over ICI.

Used by: bench.py --multichip, serve/server.py (when >1 device is
visible), __graft_entry__.dryrun_multichip, and the virtual-8-device
pytest (tests/test_multichip.py) asserting sharded == single-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sudoku_vision_tpu.parallel.mesh import make_mesh
from sudoku_vision_tpu.pipeline.graph import perceive


def sharded_perceive_fn(model, variables, mesh: Mesh | None = None,
                        aux17=None,
                        temperature=None, use_clahe: bool = True,
                        orient: str = "fixed", packed_bgr: bool = False,
                        tensor_parallel: bool = False):
    """Build (fn, mesh): fn maps (N, H, W, 3) uint8 — or row-packed
    (N, H, W*3) when packed_bgr=True, the Pallas fast layout (see
    ops/pallas_pool.py) — to perception outputs, with frames sharded
    over the mesh's "data" axis.

    N must be divisible by the data-axis size (serving pads its batch
    buckets to guarantee this). Outputs come back data-sharded and fetch
    as one host array.

    tensor_parallel=True additionally shards the CNN's conv/dense output
    channels over the mesh's "model" axis (mesh.py's TP param rules) and
    lets XLA insert the collectives inside the per-frame graph. For THIS
    classifier (~185K params) TP is pure overhead — replication is the
    right serving config, and the default — but the mechanism is wired
    and equality-tested (tests/test_multichip.py) so a bigger head drops
    in without new plumbing.
    """
    mesh = mesh or make_mesh()
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    if tensor_parallel and mesh.shape["model"] > 1:
        from sudoku_vision_tpu.parallel.mesh import (
            apply_shardings, param_sharding_rules,
        )

        variables = apply_shardings(variables,
                                    param_sharding_rules(mesh, variables))
    else:
        variables = jax.device_put(variables, replicated)
    t = None if temperature is None else jnp.float32(temperature)

    @partial(
        jax.jit,
        in_shardings=(data_sharding,),
        out_shardings=(data_sharding,) * 7,
    )
    def fn(imgs):
        out = jax.vmap(
            lambda im: perceive(im, model, variables, temperature=t,
                                use_clahe=use_clahe, orient=orient,
                                packed_bgr=packed_bgr, aux17=aux17)
        )(imgs)
        return (out.digits, out.confidence, out.probs, out.corners,
                out.grid_found, out.boundaries_y, out.boundaries_x)

    return fn, mesh


def sharded_perceive_at_fn(model, variables, mesh: Mesh | None = None,
                           temperature=None, use_clahe: bool = True,
                           packed_bgr: bool = False, aux17=None):
    """Data-sharded temporal-reuse graph (pipeline/graph.py::perceive_at):
    frames AND their locked corners/boundaries shard along the data
    axis; params replicate. The streaming sessions' detection-skip path
    under mesh serving."""
    from sudoku_vision_tpu.pipeline.graph import perceive_at

    mesh = mesh or make_mesh()
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())
    variables = jax.device_put(variables, replicated)
    t = None if temperature is None else jnp.float32(temperature)

    @partial(
        jax.jit,
        in_shardings=(data_sharding,) * 4,
        out_shardings=(data_sharding,) * 3,
    )
    def fn(imgs, corners, bys, bxs):
        out = jax.vmap(
            lambda im, c, by, bx: perceive_at(
                im, c, by, bx, model, variables, temperature=t,
                use_clahe=use_clahe, packed_bgr=packed_bgr, aux17=aux17)
        )(imgs, corners, bys, bxs)
        return out.digits, out.confidence, out.probs

    return fn, mesh


def device_put_frames(frames, mesh: Mesh):
    """Place a host frame batch sharded along the data axis."""
    return jax.device_put(
        frames, NamedSharding(mesh, P("data")))
