"""Device-mesh sharding for ciphertext pytrees.

The reference backend's only parallelism is OpenMP fork-join over
independent ciphertext operations inside one CPU process (SURVEY.md §2.3);
it has no distributed layer at all (§2.4).  The TPU-native scale-out
axes map the HE workload onto a `jax.sharding.Mesh`:

* ``dp``  — ciphertext *batch* axis (the OpenMP-loop analogue): embarrass-
  ingly parallel across chips; XLA inserts no collectives for eltwise ops
  and batched key-switches.
* ``limb`` — the RNS *limb* axis: NTT and dyadic ops are independent per
  limb, so limbs shard cleanly; key-switching's digit lift couples limbs
  and makes XLA insert all-gathers over ICI (the HE analogue of tensor
  parallelism).
* slot (``N``) axis sharding is the analogue of sequence parallelism; it
  requires a distributed NTT (all-to-all between butterfly stages) and is
  provided separately by the sharded-NTT path.

Everything here is plain `NamedSharding` placement: `jit` + GSPMD
propagate shardings through the evaluator's pure functions, so workloads
need no code changes to run sharded — placement of the operand pytrees is
the whole programming model.

Axis -> fabric contract (SURVEY.md §2.4: "ppermute/all-to-all over ICI,
with DCN only at the multi-host batch axis").  On a multi-host pod slice:

* ``dp`` — the ciphertext batch axis — is the ONLY axis allowed to span
  hosts.  Batched HE ops are embarrassingly parallel, so the sole
  cross-host traffic is result gathers at the pipeline boundary; that is
  the traffic DCN is for.
* ``sp`` (and ``limb``) MUST stay within one host: every sharded-NTT
  transform is an all_to_all over the axis and every key switch
  all-gathers lifted digits — latency-bound collectives that belong on
  ICI.  :func:`make_process_mesh` constructs meshes that enforce this by
  ordering devices process-major and validating that each sp group falls
  inside a single process.

A pod slice therefore runs the existing workloads unmodified: build the
mesh with ``make_process_mesh`` instead of ``make_mesh`` and the GSPMD
partitioner routes sp collectives over ICI and dp gathers over DCN by
construction.  (Real multi-host execution is not possible in this
single-chip environment; tests mock the process topology and the driver
dryrun prints the resulting contract.)
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("dp", "limb"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    Default shape puts every device on ``dp`` except a factor of 2 on
    ``limb`` when the device count is even (limb counts are kept even by
    the composite-rescale chain, so a 2-way limb shard always divides).
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if shape is None:
        if len(axes) == 2:
            limb = 2 if n % 2 == 0 and n > 1 else 1
            shape = (n // limb, limb)
        else:
            shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def process_grouped_order(
    process_indices: Sequence[int], group: int
) -> np.ndarray:
    """Device ordering for a process-aware (dp, sp) mesh.

    Given each device's ``process_index`` and the sp axis size ``group``,
    return the permutation that orders devices process-major, and check
    that every contiguous ``group``-sized block then lies inside ONE
    process — the invariant that keeps sp collectives (all_to_all per
    NTT, all-gather per key switch) on ICI while only the dp axis
    crosses hosts over DCN.  Raises if the topology cannot satisfy it
    (group larger than a host, or not dividing the per-host count).
    """
    procs = np.asarray(process_indices)
    n = procs.size
    if n % group:
        raise ValueError(f"{n} devices do not divide into sp groups of {group}")
    order = np.argsort(procs, kind="stable")
    grouped = procs[order].reshape(n // group, group)
    if not (grouped == grouped[:, :1]).all():
        counts = np.bincount(procs)
        raise ValueError(
            "sp axis would cross a host boundary (DCN): sp group size "
            f"{group} does not pack into per-process device counts "
            f"{counts.tolist()} — shrink sp or use a host-local mesh"
        )
    return order


def make_process_mesh(
    sp: int,
    axes: Tuple[str, str] = ("dp", "sp"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Process-aware (dp, sp) mesh: dp spans hosts (DCN), sp stays within
    a host (ICI) — the multi-host mapping of the framework's two scale-out
    axes (module docstring: axis -> fabric contract).

    ``sp`` is the sp-axis size; every other factor of the device count
    goes to dp.  Devices are ordered process-major so each sp group is
    host-local; on a single-process backend (tests, the virtual CPU mesh)
    the construction degenerates to `make_mesh` but the validation logic
    is identical to what a pod slice would run.
    """
    devs = list(devices if devices is not None else jax.devices())
    order = process_grouped_order(
        [getattr(d, "process_index", 0) for d in devs], sp
    )
    arr = np.array([devs[i] for i in order]).reshape(len(devs) // sp, sp)
    return Mesh(arr, axes)


def ct_pspec(
    n_batch_axes: int,
    batch_axes: Sequence[Optional[str]] = ("dp",),
    limb_axis: Optional[str] = None,
) -> P:
    """PartitionSpec for ciphertext data [batch…, size, limb, N]."""
    batch = list(batch_axes)[:n_batch_axes]
    batch += [None] * (n_batch_axes - len(batch))
    return P(*batch, None, limb_axis, None)


def pt_pspec(
    n_batch_axes: int,
    batch_axes: Sequence[Optional[str]] = ("dp",),
    limb_axis: Optional[str] = None,
) -> P:
    """PartitionSpec for plaintext data [batch…, limb, N]."""
    batch = list(batch_axes)[:n_batch_axes]
    batch += [None] * (n_batch_axes - len(batch))
    return P(*batch, limb_axis, None)


def shard_ct(
    ct,
    mesh: Mesh,
    n_batch_axes: int = 0,
    batch_axes: Sequence[Optional[str]] = ("dp",),
    limb_axis: Optional[str] = None,
):
    """Place a Ciphertext/Plaintext's data onto the mesh."""
    n_data_axes = ct.data.ndim
    is_pt = n_data_axes == n_batch_axes + 2  # plaintext: [batch…, L, N]
    spec = (
        pt_pspec(n_batch_axes, batch_axes, limb_axis)
        if is_pt
        else ct_pspec(n_batch_axes, batch_axes, limb_axis)
    )
    sh = NamedSharding(mesh, spec)
    return replace(ct, data=jax.device_put(ct.data, sh))


def replicate(tree, mesh: Mesh):
    """Fully replicate every array of a pytree (e.g. a KeySet) on the
    mesh — keys are broadcast once and reused, like collective-friendly
    weight replication."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") else x, tree
    )
