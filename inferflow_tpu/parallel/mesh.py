"""Device mesh construction.

Replaces the reference's device-group machinery (`devices = 0&1;2&3`,
inference_engine.cc:1738-1812, GpuInfGlobalData phase barrier) with a
jax.sharding.Mesh: BY_TENSOR -> 'tp' axis, BY_LAYER -> 'pp' axis,
HYBRID -> both, plus a data axis for batched serving.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def factor_mesh(n_devices: int) -> Tuple[int, int, int]:
    """Pick (dp, pp, tp) factors for n devices: favor tp, then pp, then dp."""
    if n_devices <= 1:
        return (1, 1, 1)
    tp = 1
    rem = n_devices
    for cand in (8, 4, 2):
        if rem % cand == 0:
            tp = cand
            rem //= cand
            break
    pp = 1
    for cand in (4, 2):
        if rem % cand == 0:
            pp = cand
            rem //= cand
            break
    dp = rem
    return (dp, pp, tp)


def balanced_factors(n_devices: int) -> Tuple[int, int, int]:
    """Spread devices over (dp, pp, tp) as evenly as possible (tp first):
    8 -> (2,2,2), 4 -> (1,2,2), 16 -> (2,2,4)."""
    dp = pp = tp = 1
    rem = n_devices
    axes = ["tp", "pp", "dp"]
    i = 0
    while rem % 2 == 0 and rem > 1:
        if axes[i % 3] == "tp":
            tp *= 2
        elif axes[i % 3] == "pp":
            pp *= 2
        else:
            dp *= 2
        rem //= 2
        i += 1
    dp *= rem  # odd remainder goes to data parallel
    return (dp, pp, tp)


def make_mesh(devices: Optional[Sequence] = None,
              dp: int = 0, pp: int = 0, tp: int = 0) -> Mesh:
    """Create a ('dp','pp','tp') mesh. Zero dims are auto-factored."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not (dp and pp and tp):
        dp, pp, tp = factor_mesh(n)
    assert dp * pp * tp == n, f"{dp}x{pp}x{tp} != {n} devices"
    arr = np.array(devices).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))


def make_sp_mesh(sp: int, devices: Optional[Sequence] = None) -> Mesh:
    """('dp','pp','tp','sp') mesh with only the sequence axis > 1.

    The serving engine's ring-attention prefill (parallel/ring_attention.py)
    shards the PROMPT over 'sp' while weights stay replicated; the axis
    names 'dp'/'pp'/'tp' remain present (size 1) so every existing sharding
    recipe (shard_params, shard_kv_cache, _place_batch) composes unchanged.
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < sp:
        raise ValueError(f"sequence_parallel={sp} needs {sp} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:sp]).reshape(1, 1, 1, sp)
    return Mesh(arr, ("dp", "pp", "tp", "sp"))


def mesh_from_groups(groups, devices: Optional[Sequence] = None
                     ) -> Optional[Mesh]:
    """Build the serving mesh from parsed ini device groups
    (`devices = 0&1;2&3` -> [[0,1],[2,3]]): `;` separates layer (pp)
    groups, `&` tensor (tp) ranks (reference LoadDeviceGroups,
    inference_engine.cc:1738-1783; strategy inference :1509-1515).
    Returns None for a single device (plain single-chip engine)."""
    ids = [i for g in groups for i in g]
    if len(ids) <= 1:
        return None
    if len({len(g) for g in groups}) != 1:
        raise ValueError(f"device groups must be equal-sized: {groups}")
    devices = list(devices if devices is not None else jax.devices())
    if max(ids) >= len(devices):
        raise ValueError(f"device id {max(ids)} requested but only "
                         f"{len(devices)} devices are visible")
    return make_mesh([devices[i] for i in ids], dp=1, pp=len(groups),
                     tp=len(groups[0]))


def strategy_to_mesh(strategy: str, n_devices: int) -> Tuple[int, int, int]:
    """Map the reference's MultiGpuStrategy names onto mesh factors
    (network_structure.h:114-119)."""
    s = strategy.lower()
    if s == "by_tensor":
        return (1, 1, n_devices)
    if s == "by_layer":
        return (1, n_devices, 1)
    if s == "hybrid":
        dp, pp, tp = factor_mesh(n_devices)
        return (1, dp * pp, tp)
    return factor_mesh(n_devices)


# ---------------------------------------------------------------------------
# Multi-host (the reference has NO multi-node story — gpu_inf_global_data is
# single-process; this is the TPU-native design: jax.distributed over DCN,
# GSPMD collectives over ICI.  BASELINE.md target: >=1.7x tokens/s 1->2
# hosts on v5e-16.)
# ---------------------------------------------------------------------------

def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """Join the jax.distributed process group (call once per host before
    any jax op).  coordinator: 'host0-addr:port'.  Launch the same serving
    binary on every host with its own process_id; jax.devices() then spans
    all hosts and make_multihost_mesh lays out the serving mesh."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def multihost_factors(n_hosts: int, devices_per_host: int,
                      tp: int = 0) -> Tuple[int, int, int]:
    """(dp, pp, tp) for a multi-host mesh: tensor parallelism stays INSIDE
    a host (collectives ride ICI), hosts become data-parallel replicas
    over DCN (pure throughput scaling — the >=1.7x 1->2 host target).
    tp=0 picks the whole host as one tp group."""
    tp = tp or devices_per_host
    if devices_per_host % tp:
        raise ValueError(f"tp={tp} must divide devices_per_host="
                         f"{devices_per_host}")
    pp = devices_per_host // tp
    return (n_hosts, pp, tp)


def make_multihost_mesh(tp: int = 0) -> Mesh:
    """('dp','pp','tp') mesh over all processes' devices, DCN on 'dp' and
    ICI inside 'pp'x'tp' (requires init_distributed first; single-process
    it degenerates to make_mesh)."""
    import jax
    n_hosts = jax.process_count()
    per_host = len(jax.devices()) // n_hosts
    dp, pp, tp = multihost_factors(n_hosts, per_host, tp)
    if n_hosts == 1:
        return make_mesh(jax.devices(), dp, pp, tp)
    devices = jax.devices()
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    if len(slice_ids) == dp and None not in slice_ids:
        # real TPU pods: honor the ICI slice topology
        from jax.experimental import mesh_utils
        devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, pp, tp), dcn_mesh_shape=(dp, 1, 1),
            devices=devices)
        return Mesh(devs, ("dp", "pp", "tp"))
    # no slice topology (CPU multi-process, or single-slice pods):
    # group by owning process — 'dp' spans processes (DCN), 'pp'x'tp'
    # stays inside one process's devices
    devs = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(dp, pp, tp)
    return Mesh(arr, ("dp", "pp", "tp"))
