"""Distributed negacyclic NTT over a slot-sharded device mesh.

The "sequence parallelism" analogue of this framework (SURVEY.md §2.4,
§5): when one chip's HBM cannot hold a ciphertext (or slot throughput
should scale), the coefficient axis itself shards across the mesh.  The
four-step layout of ops/ntt.py makes this natural:

* view the N coefficients as an ``[n1, n2=128]`` matrix and shard the
  **column** axis: phase-1 butterflies pair whole rows, so every stage is
  purely local vector math;
* the mid-transform transpose becomes ONE ``all_to_all`` over ICI (the
  only cross-chip traffic, N/D elements per device per direction);
* phase-2 butterflies pair rows of the transposed matrix — local again,
  with each device holding its slice of the (j2, r) twiddle planes.

Compare the reference backend, which has no distributed layer at all and
caps problem size at one host's slot count (SURVEY.md §2.4); here slot
capacity and NTT throughput scale with the mesh axis size.

Data convention: ``fwd()`` consumes the row-major matrix view
``[..., l, n1, n2]`` (a free reshape of the flat [..., l, N] poly) sharded
on the last axis, and returns the **transposed-layout** result
``[..., l, n2, n1]`` sharded on its last axis, exactly matching
``NttPlan._fwd_mat`` before its final un-transpose.  ``inv()`` consumes
that layout and returns the row-major matrix view.  Keeping the
transposed layout between fwd and inv avoids two extra all-to-alls per
round trip; dyadic (pointwise) ciphertext ops are layout-agnostic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reference_seal_backend_tpu.ops import modops
from reference_seal_backend_tpu.ops.ntt import _bf_ct, _bf_gs


def _phase1(plan, x, lo, n2_loc, inverse):
    """Local phase-1 stages on [..., l, n1, n2_loc] (row pairing)."""
    n1, s1 = plan.n1, plan.s1
    lead = x.shape[:-2]
    nl = x.shape[-3]
    p = plan.p[lo : lo + nl, :, None, None]
    stages = range(s1 - 1, -1, -1) if inverse else range(s1)
    for s in stages:
        m = 1 << s
        tr = n1 >> (s + 1)
        xv = x.reshape(*lead, m, 2, tr, n2_loc)
        u = xv[..., 0, :, :]
        v = xv[..., 1, :, :]
        w, ws = plan.fwd_tw[s] if not inverse else plan.inv_tw[s]
        w = w[lo : lo + nl][..., None]
        ws = ws[lo : lo + nl][..., None]
        if not inverse:
            pair = _bf_ct(u, v, w, ws, p, plan.lazy, s == 0)
        else:
            pair = _bf_gs(u, v, w, ws, p, plan.lazy)
        x = jnp.stack(pair, axis=-3).reshape(*lead, n1, n2_loc)
    return x


def _phase2(plan, xt, lo, n1_loc, col0, inverse):
    """Local phase-2 stages on [..., l, n2, n1_loc] (transposed pairing).

    ``col0`` is this device's first global r-column (twiddle plane slice).
    """
    n, n2, s1 = plan.n, plan.n2, plan.s1
    bits = n.bit_length() - 1
    lead = xt.shape[:-2]
    nl = xt.shape[-3]
    p = plan.p[lo : lo + nl, :, None, None]
    stages = (
        range(bits - 1, s1 - 1, -1) if inverse else range(s1, bits)
    )
    for s in stages:
        t = n >> (s + 1)
        m2 = n2 // (2 * t)
        xv = xt.reshape(*lead, m2, 2, t, n1_loc)
        u = xv[..., 0, :, :]
        v = xv[..., 1, :, :]
        w, ws = (
            plan.fwd_tw2[s - s1] if not inverse else plan.inv_tw2[s - s1]
        )
        w = jax.lax.dynamic_slice_in_dim(
            w[lo : lo + nl], col0, n1_loc, axis=-1
        )
        ws = jax.lax.dynamic_slice_in_dim(
            ws[lo : lo + nl], col0, n1_loc, axis=-1
        )
        if not inverse:
            pair = _bf_ct(u, v, w, ws, p, plan.lazy, False)
        else:
            pair = _bf_gs(u, v, w, ws, p, plan.lazy)
        xt = jnp.stack(pair, axis=-3).reshape(*lead, n2, n1_loc)
    return xt


def _transpose_a2a(x, axis_name):
    """[..., n1, n2_loc] sharded on cols -> [..., n2, n1_loc] sharded on
    cols of the transposed matrix: local transpose + one all_to_all."""
    y = jnp.swapaxes(x, -1, -2)  # [..., n2_loc, n1]
    return jax.lax.all_to_all(
        y, axis_name, split_axis=y.ndim - 1, concat_axis=y.ndim - 2,
        tiled=True,
    )  # [..., n2, n1/D]


def _specs(ndim: int, axis: str, batch_axes) -> P:
    """shard_map spec: leading batch dims on ``batch_axes`` (dp×sp combined
    meshes), middle dims replicated, last (space) dim on ``axis``."""
    mid = ndim - 1 - len(batch_axes)
    return P(*batch_axes, *([None] * mid), axis)


def fwd(plan, x: jnp.ndarray, mesh: Mesh, axis: str = "sp", lo: int = 0,
        batch_axes: tuple = (), epilogue: bool = True):
    """Forward NTT of matrix-view residues [..., l, n1, n2], n2 sharded on
    mesh axis ``axis``; returns transposed layout [..., l, n2, n1] sharded
    on its last axis.  ``batch_axes`` names mesh axes carrying the leading
    batch dims (data parallelism composed with sp).  Bit-exact vs
    NttPlan._fwd_mat (see tests), including its range contract: lazy
    plans accept inputs in [0, 2p), and ``epilogue=False`` skips the
    final canonicalising reduction so range-tolerant consumers (Shoup
    inner products) read the raw [0, 4p) stage output."""
    d = mesh.shape[axis]
    n1_loc = plan.n1 // d

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=_specs(x.ndim, axis, batch_axes),
        out_specs=_specs(x.ndim, axis, batch_axes),
    )
    def body(x_loc):
        n2_loc = x_loc.shape[-1]
        x1 = _phase1(plan, x_loc, lo, n2_loc, inverse=False)
        xt = _transpose_a2a(x1, axis)
        col0 = jax.lax.axis_index(axis) * n1_loc
        out = _phase2(plan, xt, lo, n1_loc, col0, inverse=False)
        if plan.lazy and epilogue:
            nl = out.shape[-3]
            out = modops.reduce_4p_full(out, plan.p[lo : lo + nl, :, None])
        return out

    return body(x)


def inv(plan, xt: jnp.ndarray, mesh: Mesh, axis: str = "sp", lo: int = 0,
        batch_axes: tuple = ()):
    """Inverse NTT from transposed layout [..., l, n2, n1] (n1 sharded) back
    to matrix view [..., l, n1, n2] (n2 sharded)."""
    d = mesh.shape[axis]
    n1_loc = plan.n1 // d
    nw, nws = plan.n_inv

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=_specs(xt.ndim, axis, batch_axes),
        out_specs=_specs(xt.ndim, axis, batch_axes),
    )
    def body(xt_loc):
        nl = xt_loc.shape[-3]
        col0 = jax.lax.axis_index(axis) * n1_loc
        y = _phase2(plan, xt_loc, lo, n1_loc, col0, inverse=True)
        # transpose back: [..., n2, n1_loc] -> [..., n1, n2_loc]
        x = _transpose_a2a(y, axis)
        x = _phase1(plan, x, lo, x.shape[-1], inverse=True)
        return modops.shoup_mul(
            x,
            nw[lo : lo + nl][..., None],
            nws[lo : lo + nl][..., None],
            plan.p[lo : lo + nl, :, None],
        )

    return body(xt)


def shard_matrix_view(plan, x_flat, mesh: Mesh, axis: str = "sp"):
    """[..., l, N] flat poly -> matrix view [..., l, n1, n2] with the n2
    (column) axis sharded over ``axis``."""
    mat = x_flat.reshape(*x_flat.shape[:-1], plan.n1, plan.n2)
    spec = P(*([None] * (mat.ndim - 1)), axis)
    return jax.device_put(mat, NamedSharding(mesh, spec))
