"""Channel-sharded tracking: N channels spread over the mesh's sat axis.

Tracking is sequential in time (the loop filters feed forward,
track-gps-l1.py:33-94) so the only scalable axis is channels — exactly the
reference's "one process per track script" usage, but as one jit program.
State leaves and code tables shard over 'sat'; the sample chunk is
replicated (every channel reads the same stream).  There are no collectives
in the step at all — XLA just partitions the vmap — so scaling is linear.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from gnss_dsp_tpu.track.engine import track_scan, TrackState


def shard_channels(mesh, state: TrackState, code_tab):
    """Place per-channel state/code-tables on the mesh ('sat' axis).
    Channel count must be a multiple of the sat-axis size."""
    chan = NamedSharding(mesh, P("sat"))
    chan2 = NamedSharding(mesh, P("sat", None))
    state = jax.tree.map(lambda a: jax.device_put(a, chan), state)
    return state, jax.device_put(code_tab, chan2)


def track_scan_sharded(mesh, x_chunk, chunk_len, code_tab, state, params,
                       n_blocks: int, ratios=None, coffset_df=None,
                       sigp=None, code_rows_ext=None, overlay=None,
                       multihost: bool = False):
    """Run track_scan with channel-sharded state.  x replicated; the
    per-channel carrier-aiding ratios and FDMA carrier-offset increments
    shard with the channels.

    code_rows_ext + params.fused_scan routes each device's channel shard
    through the FUSED whole-loop Pallas kernel under shard_map (a
    pallas_call has no auto-partitioning rule, so the sharded scan
    historically forced the XLA correlator — this path tracks at the
    fused kernel's per-chip rate instead).  Without it the XLA-correlator
    vmap scan auto-partitions as before.

    multihost=True runs the same program multi-controller: every process
    passes the full host copy of each operand (only its addressable
    shards are materialized) and the sharded outputs are allgathered, so
    every process returns identical full rows/state — same contract as
    parallel/acquire.acquire_signal_sharded."""
    fused = bool(params.fused_scan) and code_rows_ext is not None
    if fused:
        # shard_map takes concrete operands: materialize the defaults
        # track_scan would otherwise synthesize
        import jax.numpy as jnp

        C = state.ptr.shape[0]
        if ratios is None:
            ratios = jnp.full((C,), params.carrier_ratio, jnp.float32)
        if coffset_df is None:
            coffset_df = jnp.full((C,), params.coffset_df_fixed, jnp.int32)
        if sigp is None:
            from gnss_dsp_tpu.track.engine import sigp_from_params

            sigp = sigp_from_params(params, C)
        if overlay is None:
            overlay = jnp.ones((C, 1), jnp.float32)
    else:
        assert overlay is None, "overlay tracking needs the fused branch"
    if not fused and params.use_pallas:
        # pallas has no auto-partitioning rule; outside the shard_map
        # route the scan must run its XLA correlator
        params = params._replace(use_pallas=False, fused_scan=False)
    chan = NamedSharding(mesh, P("sat"))
    if multihost:
        import numpy as np

        def g(spec, a):
            # every process passes the FULL host copy; jax slices each
            # device's shard from it (make_array_from_process_local_data
            # would instead CONCATENATE the per-process copies)
            a = np.asarray(a)
            s = NamedSharding(mesh, spec)
            return jax.make_array_from_callback(a.shape, s,
                                                lambda idx: a[idx])

        x_chunk = tuple(g(P(), a) for a in x_chunk)
        state = jax.tree.map(
            lambda a: g(P("sat") if a.ndim == 1 else P("sat", None), a),
            state)
        code_tab = g(P("sat", None), code_tab)
        if ratios is not None:
            ratios = g(P("sat"), ratios)
        if coffset_df is not None:
            coffset_df = g(P("sat"), coffset_df)
        if sigp is not None:
            sigp = g(P("sat", None), sigp)
        if code_rows_ext is not None:
            code_rows_ext = g(P("sat", None), code_rows_ext)
        if overlay is not None:
            overlay = g(P("sat", None), overlay)
    else:
        rep = NamedSharding(mesh, P())
        x_chunk = jax.device_put(x_chunk, rep)
        state, code_tab = shard_channels(mesh, state, code_tab)
        if ratios is not None:
            ratios = jax.device_put(ratios, chan)
        if coffset_df is not None:
            coffset_df = jax.device_put(coffset_df, chan)
        if sigp is not None:
            sigp = jax.device_put(
                sigp, NamedSharding(mesh, P("sat", None)))
        if code_rows_ext is not None:
            code_rows_ext = jax.device_put(
                code_rows_ext, NamedSharding(mesh, P("sat", None)))
        if overlay is not None:
            overlay = jax.device_put(
                overlay, NamedSharding(mesh, P("sat", None)))
    if fused:
        from gnss_dsp_tpu.parallel.acquire import shard_map

        def local(x0, x1, cl, tab, st, rat, cdf, sp, rows, ovl):
            return track_scan((x0, x1), cl, tab, st, params, n_blocks,
                              ratios=rat, code_rows_ext=rows,
                              coffset_df=cdf, sigp=sp, overlay=ovl)

        fn = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P("sat"), P("sat"), P("sat"),
                      P("sat"), P("sat"), P("sat"), P("sat")),
            out_specs=(P("sat"), P(None, "sat"), P(None, "sat")),
            check_rep=False))
        out = fn(x_chunk[0], x_chunk[1], chunk_len, code_tab, state,
                 ratios, coffset_df, sigp, code_rows_ext, overlay)
    else:
        out = track_scan(x_chunk, chunk_len, code_tab, state, params,
                         n_blocks, ratios=ratios, coffset_df=coffset_df,
                         sigp=sigp)
    if multihost:
        # replicate on-device (multihost_utils.process_allgather mangles
        # the middle-axis-sharded [B, C, 11] rows), then read locally
        import numpy as np

        rep = NamedSharding(mesh, P())
        out = jax.jit(lambda t: t, out_shardings=rep)(out)
        return jax.tree.map(np.asarray, out)
    return out
