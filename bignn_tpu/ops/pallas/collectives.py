"""Pallas ICI collectives: all-to-all over a mesh axis (SURVEY.md §5
distributed-comm row; pattern follows the public Pallas distributed guide and
SNIPPETS.md:76-140 make_async_remote_copy usage).

``all_to_all_pallas`` is the remote-DMA implementation of the halo exchange's
wire step (parallel/halo.py): each device pushes chunk j of its send buffer
directly into slot ``my_id`` of device j's receive buffer over ICI. Compared
to ``lax.all_to_all`` this kernel is the building block for deeper
communication/computation overlap (the send can be issued mid-kernel in
future fusions); today it is interface-compatible and validated:

  * FULL multi-device protocol (barrier, remote DMA, per-source recv
    semaphores) vs lax.all_to_all on a 4-fake-device mesh under the Pallas
    TPU simulator (``pltpu.InterpretParams`` — unlike the HLO interpreter it
    models cross-device DMA), tests/test_pallas_collectives.py;
  * degenerate axis_size=1 on CPU interpret + one real TPU chip (self-copy);
  * compiled multi-chip parity when >= 2 TPU devices are attached (skipped
    otherwise — this environment exposes a single chip; SURVEY.md §6).

Protocol per device (all devices run the same program):
  1. global barrier with every peer (the receiver's output buffer must exist
     before remote writes land);
  2. local copy of chunk ``my_id``;
  3. start RDMA of chunk j -> peer j's slot ``my_id``; the sender signals the
     receiver's per-source recv semaphore, so waiting on recv_sem[i] for all
     i != me guarantees arrival of every slot;
  4. drain send semaphores before exit (buffers must not be reused while
     sends are in flight).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bignn_tpu.ops.pallas.util import out_struct


def _a2a_kernel(send_ref, recv_ref, send_sem, recv_sem, copy_sem, *,
                axis_name: str, axis_size: int, collective_id: int):
    my_id = jax.lax.axis_index(axis_name)

    # ---- barrier with all peers ---------------------------------------
    if axis_size > 1:
        barrier = pltpu.get_barrier_semaphore()
        for j in range(axis_size):
            @pl.when(j != my_id)
            def _(j=j):
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id={axis_name: j},
                    device_id_type=pltpu.DeviceIdType.MESH,
                )
        pltpu.semaphore_wait(barrier, axis_size - 1)

    # ---- local chunk ---------------------------------------------------
    local = pltpu.make_async_copy(
        send_ref.at[my_id], recv_ref.at[my_id], copy_sem
    )
    local.start()

    # ---- remote pushes (statically absent for a 1-device axis) ---------
    for j in range(axis_size if axis_size > 1 else 0):
        @pl.when(j != my_id)
        def _(j=j):
            rdma = pltpu.make_async_remote_copy(
                src_ref=send_ref.at[j],
                dst_ref=recv_ref.at[my_id],
                send_sem=send_sem.at[j],
                recv_sem=recv_sem.at[my_id],
                device_id={axis_name: j},
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma.start()

    # ---- waits ---------------------------------------------------------
    # DMA semaphores count bytes, so waits go through descriptor .wait()
    # (which knows the chunk's byte size), not semaphore_wait.
    local.wait()
    for i in range(axis_size if axis_size > 1 else 0):
        @pl.when(i != my_id)
        def _(i=i):
            # sender i addressed our recv_sem at index i (its my_id);
            # one chunk's worth of bytes lands per sender.
            pltpu.make_async_copy(
                recv_ref.at[i], recv_ref.at[i], recv_sem.at[i]
            ).wait()
    for j in range(axis_size if axis_size > 1 else 0):
        @pl.when(j != my_id)
        def _(j=j):
            pltpu.make_async_copy(
                send_ref.at[j], send_ref.at[j], send_sem.at[j]
            ).wait()


def all_to_all_pallas(
    x: jax.Array,  # [G, S, F] per-device send buffer (slot j -> device j)
    axis_name: str,
    axis_size: int,
    *,
    collective_id: int = 7,
    interpret=None,
) -> jax.Array:
    """Pallas remote-DMA all-to-all; result[i] = chunk sent by device i.

    Must be called inside shard_map over ``axis_name``. Falls back to a plain
    copy when axis_size == 1.

    ``interpret``: True (HLO interpreter — degenerate single-device only) or
    a ``pltpu.InterpretParams`` (TPU simulator: validates the REAL multi-
    device protocol — barrier, RDMA, per-source semaphores — on fake CPU
    devices; tests/test_pallas_collectives.py). Defaults from the op
    backend: the ``pallas_interpret`` backend gets the TPU simulator,
    everything else compiles.
    """
    if interpret is None:
        from bignn_tpu.ops.dispatch import get_backend

        interpret = (
            pltpu.InterpretParams()
            if get_backend(None) == "pallas_interpret"
            else False
        )
    g, s, f = x.shape
    assert g == axis_size, (g, axis_size)

    def call(v):
        return _a2a_call(v, axis_name, axis_size, collective_id, interpret)

    # The exchange is linear and SELF-ADJOINT: recv_i[j] = send_j[i], so the
    # cotangent of my recv slot j flows back as peer j's send slot i — the
    # identical all-to-all applied to the cotangents. This custom VJP lets
    # the kernel sit inside differentiated train steps (parallel/halo.py
    # halo_impl="pallas"), mirroring how AD transposes lax.all_to_all.
    @jax.custom_vjp
    def f(v):
        return call(v)

    f.defvjp(lambda v: (call(v), None), lambda _, ct: (call(ct),))
    return f(x)


def _a2a_call(x, axis_name, axis_size, collective_id, interpret):
    g, s, f = x.shape
    kernel = functools.partial(
        _a2a_kernel,
        axis_name=axis_name,
        axis_size=axis_size,
        collective_id=collective_id,
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=out_struct((g, s, f), x.dtype, x),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((axis_size,)),  # send
            pltpu.SemaphoreType.DMA((axis_size,)),  # recv (per source)
            pltpu.SemaphoreType.DMA(()),  # local copy
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # collective_id backs the custom barrier; only legal when the
            # barrier is actually present (axis_size > 1)
            collective_id=collective_id if axis_size > 1 else None,
        ),
        interpret=interpret,
    )(x)
