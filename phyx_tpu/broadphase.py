"""Broadphase: candidate pair generation under static shapes.

TPU-native rebuild of the reference's sorted-AABB sweep & prune
(SURVEY.md §2 C3, §3.5).  The C++ version emits a variable-length pair list
while scanning sorted x-intervals; here the same algorithm is re-shaped for
XLA's static-shape model:

  * ``sap``: sort bodies by AABB min-x (``jax.lax.sort``), examine a fixed
    window of forward neighbors per body (the sweep), and compact the
    surviving pairs into a fixed ``max_pairs`` buffer with a prefix-sum
    scatter.  Truncated windows and buffer overflow are *counted*, not
    silently dropped, so callers can grow budgets (SURVEY.md §7 hard part #1).
  * ``n2``: masked all-pairs upper triangle — exact, used for small scenes
    and as the ground truth in tests.

Both paths emit pairs sorted lexicographically by ``(pi, pj)`` so the
contact-cache join (cache.py) is a deterministic merge.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from phyx_tpu.config import SimConfig
from phyx_tpu.types import Bodies, ContactCache, _pytree_dataclass

EMPTY = ContactCache.EMPTY  # int32 sentinel key, sorts last

# Carrying sweep columns THROUGH the body sort as payload operands vs
# argsort + one packed row gather: fenced at 16k/32k/64k/264k/1M rows
# (benches/micro_banded_sort.py, 2026-08-19) — carry wins ≥32k rows
# (0.095 vs -0.014 ms @ 32k, 3.15 vs 0.41 ms @ 264k) and is a wash at
# 16k (both sub-noise), so carry ships unconditionally.  VERDICT r3 #1b
# suspected carry caused the 27.96 -> 26.79 @ 10k drop; re-measured
# same-session round 4: the OLD tree (dc67a0c) reads 26.63 and HEAD
# 26.75 with bit-identical physics stats — the drop was day-to-day
# device/tunnel variance, not code (BASELINE.md row B).


@_pytree_dataclass
class TiledRouting:
    """Slab-routing byproducts of the slab-major tiled broadphase
    (round 5): everything solver.solve_pallas_tiled2 needs to run the
    slab-segmented kernel with ZERO routing sorts of its own.  The
    round-4 path re-sorted contacts into per-slab block budgets with a
    20-operand sort and inverted it for the accumulators; here the pair
    finalize sort itself is keyed (slab, pi, pj), so contacts arrive
    slab-major and these fields ride along.

    ``lb1``/``lb2`` are WINDOW-LOCAL embedded endpoint rows (x8, ready
    for the kernel's SMEM addressing), clamped into their pair's slab
    window; ``pair_cum[s]`` counts kept pairs of slabs < s (cum[-1] =
    kept total).  ``order``/``ranked_cols`` are the broadphase body
    sort's permutation (rank -> id) and the body value columns
    (vel x/y, angvel, inv_mass, inv_inertia) carried through that sort,
    from which the solver builds its embedded body table without
    re-sorting."""

    order: jax.Array        # (N,)  i32 body id at rank r
    ranked_cols: jax.Array  # (N, 5) f32 body values in rank order
    lb1: jax.Array          # (P,)  i32 window-local row of pi (x8)
    lb2: jax.Array          # (P,)  i32 window-local row of pj (x8)
    pair_cum: jax.Array     # (n_slabs+1,) i32 kept-pair cumsum


@_pytree_dataclass
class Pairs:
    """Fixed-capacity candidate pair buffer (output of broadphase).

    ``pi < pj`` body indices, lex-sorted, with free slots at ``EMPTY``.
    ``overflow`` aggregates the per-cause counters (kept so existing
    consumers keep working); the ``ovf_*`` breakdown says which budget
    to grow (VERDICT r3 #3) — see types.SolverStats for the legend.
    """

    pi: jax.Array        # (P,) int32
    pj: jax.Array        # (P,) int32
    valid: jax.Array     # (P,) bool
    num: jax.Array       # ()  int32  number of valid pairs
    overflow: jax.Array  # ()  int32  pairs dropped or possibly missed (sum)
    ovf_window: jax.Array  # () int32 window-truncated sweeps
    ovf_slots: jax.Array   # () int32 per-body hit-slot spills
    ovf_drop: jax.Array    # () int32 pair-buffer drops
    ovf_band: jax.Array    # () int32 band crossers / segsort drifters
    ovf_slab: jax.Array    # () int32 tiled-solver slab clamps (counted
    #                        here on the slab-major path, else added by
    #                        step.solve_stage's legacy tiled routing)
    # slab-major tiled path only (broadphase_sap_tiled with
    # emit_routing); None everywhere else
    routing: TiledRouting | None = None

    @staticmethod
    def of(pi, pj, valid, num, overflow=0, ovf_window=0, ovf_slots=0,
           ovf_drop=0, ovf_band=0, ovf_slab=0) -> "Pairs":
        """Construct with int-friendly overflow fields (tests/helpers)."""
        i32 = lambda x: jnp.asarray(x, jnp.int32)
        return Pairs(pi=pi, pj=pj, valid=valid, num=i32(num),
                     overflow=i32(overflow), ovf_window=i32(ovf_window),
                     ovf_slots=i32(ovf_slots), ovf_drop=i32(ovf_drop),
                     ovf_band=i32(ovf_band), ovf_slab=i32(ovf_slab))


def compute_aabbs(bodies: Bodies):
    """Per-body world AABB of the rotated box: extent = |R| @ half_extent."""
    c = jnp.abs(bodies.rot[:, 0])
    s = jnp.abs(bodies.rot[:, 1])
    hx, hy = bodies.half_extent[:, 0], bodies.half_extent[:, 1]
    ex = c * hx + s * hy
    ey = s * hx + c * hy
    e = jnp.stack([ex, ey], axis=-1)
    return bodies.pos - e, bodies.pos + e


def banded_x(lo, hi, active, cfg: SimConfig):
    """Banded sweep x-keys (config.sweep_band_h, mega-scene band grids).

    Returns ``(swx_lo, swx_hi, n_cross, bucket)``: per-body sweep
    interval ends with each y-band offset into its own x region, the
    count of active bodies whose own AABB crosses a band boundary (pairs
    touching such a body can be silently missed by a banded sweep, so
    the caller adds ``n_cross`` to the pair-overflow counter — no silent
    loss), and each body's f32 band index (of its AABB lo corner).
    The hi end is inflated by span * 2**-18, which bounds the f32
    rounding of ``x + bucket * span`` for <= 31 bands: within a band the
    candidate set can only grow (extra candidates die in narrowphase).
    With sweep_band_h == 0 this is the identity (and n_cross == 0)."""
    if cfg.sweep_band_h <= 0.0:
        return lo[:, 0], hi[:, 0], jnp.int32(0), jnp.zeros(
            lo.shape[0], jnp.float32)
    inv_h = jnp.float32(1.0 / cfg.sweep_band_h)
    y0 = jnp.float32(cfg.sweep_band_y0)
    b_lo = jnp.floor((lo[:, 1] - y0) * inv_h)
    b_hi = jnp.floor((hi[:, 1] - y0) * inv_h)
    n_cross = (active & (b_lo != b_hi)).sum(dtype=jnp.int32)
    span = jnp.float32(cfg.sweep_band_span)
    off = b_lo * span
    pad = span * jnp.float32(2.0 ** -18)
    return lo[:, 0] + off, hi[:, 0] + off + pad, n_cross, b_lo


def segmented_order(keys: jax.Array, cfg: SimConfig) -> jax.Array:
    """Per-band batched sort of banded sweep keys → global order array.

    XLA's TPU sort is O(log^2 n) compare-exchange passes over the whole
    array; when the band-grid layout is static (config.sweep_band_rows/
    _n/_cols — concat_envs mega-scenes), each y-band can be sorted
    independently in ONE batched ``lax.sort``: same rows per pass,
    log^2(rows/band) passes.  Bands are NOT memory-contiguous (env e's
    y-band is ``e % B``, y cycling fastest), so the (X, B, R) reshape is
    transposed to (B, X*R) — a block transpose, not a row gather — with
    original body ids carried through the sort as the value column.

    The result concatenates bands in bucket order, each ascending, then
    the inactive tail rows in index order — the SAME permutation the
    flat ``argsort`` of banded keys produces when every body sits in its
    home band (bands occupy disjoint key ranges; both sorts are stable).
    Bodies that LEFT their home band land at their segment's edge
    instead of their true band: their cross-band pairs are not emitted,
    so the caller must count them into overflow (broadphase_sap_tiled
    counts ``bucket != home`` bodies)."""
    R, B, X = (cfg.sweep_band_rows, cfg.sweep_band_n, cfg.sweep_band_cols)
    n = keys.shape[0]
    head = X * B * R
    assert head <= n, (head, n)
    ids = jnp.arange(n, dtype=jnp.int32)
    kt = keys[:head].reshape(X, B, R).transpose(1, 0, 2).reshape(B, X * R)
    it = ids[:head].reshape(X, B, R).transpose(1, 0, 2).reshape(B, X * R)
    _, sorted_ids = jax.lax.sort((kt, it), num_keys=1)
    return jnp.concatenate([sorted_ids.reshape(-1), ids[head:]])


def lex_sort_pairs(pi, pj, n_cap: int):
    """Lex-sort id columns ``(pi, pj)`` with EMPTY rows last.

    When both ids fit a packed int32 key (``2 * ceil(log2(n_cap)) <= 31``
    — true for the 10k/20k bench capacities), ONE single-key sort replaces
    the two-key lex sort: the TPU sort's cost scales with the number of
    key columns compared and carried.  EMPTY rows pack to the EMPTY
    sentinel itself (int32 max, still sorts last) and unpack back exactly.

    Precondition: rows are fully valid (both ids < n_cap) or fully EMPTY —
    every call site constructs them that way.  Falls back to the two-key
    ``jax.lax.sort`` above 2^15 capacity (100k+ scenes)."""
    bits = max(1, int(n_cap - 1).bit_length())
    if 2 * bits > 31:
        return jax.lax.sort((pi, pj), num_keys=2)
    empty = pi == EMPTY
    key = jnp.where(empty, jnp.int32(EMPTY), (pi << bits) | pj)
    key_s = jax.lax.sort(key)
    e = key_s == jnp.int32(EMPTY)
    pi_s = jnp.where(e, EMPTY, key_s >> bits)
    pj_s = jnp.where(e, EMPTY, key_s & jnp.int32((1 << bits) - 1))
    return pi_s, pj_s


def _finish(pi, pj, valid, max_pairs, n_cap=None,
            ovf_window=0, ovf_slots=0, ovf_drop=0, ovf_band=0):
    """Compact candidate (pi, pj, valid) of any shape into a lex-sorted
    fixed buffer of size max_pairs.

    One full-grid 2-key lex sort (EMPTY keys last) + a static slice.
    The earlier big-grid path compacted with a size-bounded
    ``jnp.nonzero`` first and sorted only max_pairs rows; fenced
    micro-benches (2026-08-17, /tmp-level records in BASELINE.md) showed
    the nonzero (a full-grid cumsum + serialized gather on this chip)
    costs MORE than sorting the whole grid: 2.85 ms vs 1.18 ms at the
    10k-bench shape (139k grid / 32k pairs), 42.8 ms vs 7.7 ms at the
    100k-avalanche shape (2.1M grid / 819k pairs).  XLA's TPU sort is
    the one primitive here that is not row-serialized.

    The ``ovf_*`` kwargs are the caller's per-cause overflow counts
    (VERDICT r3 #3); candidates sliced off past ``max_pairs`` here are
    added to ``ovf_drop``."""
    pi = pi.reshape(-1).astype(jnp.int32)
    pj = pj.reshape(-1).astype(jnp.int32)
    valid = valid.reshape(-1)

    pi = jnp.where(valid, pi, EMPTY)
    pj = jnp.where(valid, pj, EMPTY)
    num = valid.sum(dtype=jnp.int32)

    if n_cap is None:
        pi_s, pj_s = jax.lax.sort((pi, pj), num_keys=2)
    else:
        pi_s, pj_s = lex_sort_pairs(pi, pj, n_cap)
    pi_out = jax.lax.dynamic_slice_in_dim(pi_s, 0, max_pairs) \
        if pi_s.shape[0] >= max_pairs else jnp.pad(
            pi_s, (0, max_pairs - pi_s.shape[0]), constant_values=EMPTY)
    pj_out = jax.lax.dynamic_slice_in_dim(pj_s, 0, max_pairs) \
        if pj_s.shape[0] >= max_pairs else jnp.pad(
            pj_s, (0, max_pairs - pj_s.shape[0]), constant_values=EMPTY)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    ovf_window = i32(ovf_window)
    ovf_slots = i32(ovf_slots)
    ovf_band = i32(ovf_band)
    ovf_drop = i32(ovf_drop) + jnp.maximum(num - max_pairs, 0)
    return Pairs(
        pi=pi_out,
        pj=pj_out,
        valid=pi_out != EMPTY,
        num=jnp.minimum(num, max_pairs),
        overflow=ovf_window + ovf_slots + ovf_drop + ovf_band,
        ovf_window=ovf_window,
        ovf_slots=ovf_slots,
        ovf_drop=ovf_drop,
        ovf_band=ovf_band,
        ovf_slab=jnp.zeros((), jnp.int32),
    )


def _finish_slab_major(pi, pj, valid, pz, cfg, max_pairs, n_cap,
                       n_slabs, order_n, ranked_cols,
                       ovf_window=0, ovf_slots=0, ovf_drop=0,
                       ovf_band=0) -> Pairs:
    """Slab-major variant of _finish (round 5): compact candidates into
    the fixed pair buffer sorted by (slab, pi, pj) — (slab, pi) pack
    into one int32 key (tiling.routing_bits_ok guards the fit) — with
    the routed endpoint rows riding the sort as payloads.  The kept-pair
    per-slab cumsum falls out of a searchsorted on the packed key.
    Attaches TiledRouting for solver.solve_pallas_tiled2.

    Routing runs AFTER a valid-first compaction sort, on the max_pairs
    survivors only: pz-table gathers are row-serialized on this chip,
    and the candidate buffer (sweep slots + the (K, N) long-object
    lane) is 5-10x the pair budget — routing it whole cost the 20k pile
    ~25% of its step (fenced 2026-08-20: 11.45 -> 8.64 steps/s when the
    round-5 pipeline first shipped with full-buffer routing).  Under
    drop-overflow (already a quality failure) the dropped SET differs
    from the one-sort form: highest (pi, pj) pairs drop rather than
    highest (slab, pi, pj) — ovf_drop counts them either way."""
    pi = pi.reshape(-1).astype(jnp.int32)
    pj = pj.reshape(-1).astype(jnp.int32)
    valid = valid.reshape(-1)
    num = valid.sum(dtype=jnp.int32)

    # stage 1: valid-first compaction on (pi, pj) — the only
    # candidate-buffer-sized work, 2 operands
    key1 = jnp.where(valid, pi, jnp.int32(EMPTY))
    pjv = jnp.where(valid, pj, EMPTY)
    key_s, pj_s = jax.lax.sort((key1, pjv), num_keys=2)

    def cut(x, fill):
        return jax.lax.dynamic_slice_in_dim(x, 0, max_pairs) \
            if x.shape[0] >= max_pairs else jnp.pad(
                x, (0, max_pairs - x.shape[0]), constant_values=fill)

    pi_c = cut(key_s, EMPTY)
    pj_c = cut(pj_s, EMPTY)
    live = pi_c != jnp.int32(EMPTY)

    # stage 2: route the survivors (2 gathers at max_pairs rows)
    from phyx_tpu.tiling import route_pairs, slab_dims
    nm1 = jnp.int32(n_cap - 1)
    lb1, lb2, slab, in_win = route_pairs(
        pz, jnp.clip(pi_c, 0, nm1), jnp.clip(pj_c, 0, nm1), cfg, n_cap)
    ovf_slab = (live & ~in_win).sum(dtype=jnp.int32)
    # window-local rows, pre-scaled x8 for the kernel's SMEM addressing;
    # dead slots carry canonical zeros (the buffer is a pure function of
    # the pair SET, not the emitter)
    Ks = slab_dims(cfg, n_cap)[0]
    lb1 = jnp.where(live, (lb1 - slab * Ks) * 8, 0)
    lb2 = jnp.where(live, (lb2 - slab * Ks) * 8, 0)

    # stage 3: slab-major order — (slab, pi) pack into the sort key,
    # max_pairs rows, 4 operands
    bits = max(1, int(n_cap - 1).bit_length())
    key2 = jnp.where(live, (slab << bits) | pi_c, jnp.int32(EMPTY))
    key_o, pj_out, lb1_o, lb2_o = jax.lax.sort(
        (key2, pj_c, lb1, lb2), num_keys=2)
    e = key_o == jnp.int32(EMPTY)
    pi_out = jnp.where(e, EMPTY, key_o & jnp.int32((1 << bits) - 1))
    pair_cum = jnp.searchsorted(
        key_o, jnp.arange(n_slabs + 1, dtype=jnp.int32) << bits,
        side="left").astype(jnp.int32)

    i32 = lambda x: jnp.asarray(x, jnp.int32)
    ovf_window = i32(ovf_window)
    ovf_slots = i32(ovf_slots)
    ovf_band = i32(ovf_band)
    ovf_slab = i32(ovf_slab)
    ovf_drop = i32(ovf_drop) + jnp.maximum(num - max_pairs, 0)
    return Pairs(
        pi=pi_out,
        pj=pj_out,
        valid=pi_out != EMPTY,
        num=jnp.minimum(num, max_pairs),
        overflow=(ovf_window + ovf_slots + ovf_drop + ovf_band
                  + ovf_slab),
        ovf_window=ovf_window,
        ovf_slots=ovf_slots,
        ovf_drop=ovf_drop,
        ovf_band=ovf_band,
        ovf_slab=ovf_slab,
        routing=TiledRouting(order=order_n, ranked_cols=ranked_cols,
                             lb1=lb1_o, lb2=lb2_o, pair_cum=pair_cum),
    )


def broadphase_n2(bodies: Bodies, cfg: SimConfig) -> Pairs:
    """Masked O(N^2) all-pairs broadphase (exact; small scenes / tests)."""
    n = bodies.capacity
    lo, hi = compute_aabbs(bodies)
    dynamic = bodies.inv_mass > 0.0

    # (i, j) grids over the upper triangle
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    tri = jj > ii

    overlap_x = (lo[:, None, 0] <= hi[None, :, 0]) & (lo[None, :, 0] <= hi[:, None, 0])
    overlap_y = (lo[:, None, 1] <= hi[None, :, 1]) & (lo[None, :, 1] <= hi[:, None, 1])
    act = bodies.active[:, None] & bodies.active[None, :]
    dyn = dynamic[:, None] | dynamic[None, :]

    valid = tri & overlap_x & overlap_y & act & dyn
    return _finish(ii, jj, valid, cfg.max_pairs, n_cap=bodies.capacity)


def _long_object_lane(bodies: Bodies, lo, hi, dynamic, k_long: int):
    """Long-object dense lane shared by the windowed/grid/tiled sweeps.

    The ``sap_long_k`` bodies with the largest x-extent (ground planes,
    slopes) are pulled out of the sweep and tested densely against
    everything (K*N AABB tests — exact and cheap for K<=16): a long body's
    x-interval stays open across the whole axis, which no fixed window can
    cover (classic SAP long-object failure).  Returns
    (d_pi, d_pj, d_valid, is_long) with (K, N)-shaped candidate grids.
    """
    n = bodies.capacity
    extent_x = jnp.where(bodies.active, hi[:, 0] - lo[:, 0], -jnp.inf)
    _, long_idx = jax.lax.top_k(extent_x, k_long)          # (K,)
    long_idx = long_idx.astype(jnp.int32)
    is_long = jnp.zeros((n,), bool).at[long_idx].set(True) & bodies.active
    # rank of each body inside the long set (-1 if not long) for dedupe
    long_rank = jnp.full((n,), -1, jnp.int32).at[long_idx].set(
        jnp.arange(k_long, dtype=jnp.int32))

    jdx = jnp.arange(n, dtype=jnp.int32)
    l_lo, l_hi = lo[long_idx], hi[long_idx]                # (K, 2)
    l_act = bodies.active[long_idx] & is_long[long_idx]
    l_dyn = dynamic[long_idx]
    dox = (l_lo[:, None, 0] <= hi[None, :, 0]) & (lo[None, :, 0] <= l_hi[:, None, 0])
    doy = (l_lo[:, None, 1] <= hi[None, :, 1]) & (lo[None, :, 1] <= l_hi[:, None, 1])
    dact = l_act[:, None] & bodies.active[None, :]
    ddyn = l_dyn[:, None] | dynamic[None, :]
    notself = long_idx[:, None] != jdx[None, :]
    # long-long pairs counted once: keep only when j's rank exceeds ours
    dedupe = (~is_long[None, :]) | (
        long_rank[None, :] > jnp.arange(k_long, dtype=jnp.int32)[:, None])
    d_valid = dox & doy & dact & ddyn & notself & dedupe
    d_pi = jnp.minimum(long_idx[:, None], jdx[None, :])
    d_pj = jnp.maximum(long_idx[:, None], jdx[None, :])
    return d_pi, d_pj, d_valid, is_long


def broadphase_sap(bodies: Bodies, cfg: SimConfig) -> Pairs:
    """Sorted sweep & prune with a fixed forward window (SURVEY.md §2 C3).

    The reference's sweep scans forward until the x-interval closes —
    unbounded trip count.  The windowed form bounds it; long bodies use the
    dense lane (_long_object_lane).  The window-truncation counter then
    only fires for genuinely over-dense regular neighborhoods.
    """
    n = bodies.capacity
    w = min(cfg.sap_window, n - 1)
    k_long = min(cfg.sap_long_k, n)
    lo, hi = compute_aabbs(bodies)
    dynamic = bodies.inv_mass > 0.0
    d_pi, d_pj, d_valid, is_long = _long_object_lane(
        bodies, lo, hi, dynamic, k_long)

    # --- windowed sweep over the remaining (regular) bodies ---
    sweep_act = bodies.active & ~is_long
    keys = jnp.where(sweep_act, lo[:, 0], jnp.float32(jnp.inf))
    order = jnp.argsort(keys).astype(jnp.int32)
    slo = lo[order]
    shi = hi[order]
    sact = sweep_act[order]
    sdyn = dynamic[order]

    # Sweep: body at sorted position k against sorted positions k+1..k+w+1,
    # as ONE batched gather over a (w+1, n) neighbor grid (a Python loop of
    # w rolls would inflate the HLO ~w-fold and blow up compile time).
    kk = jax.lax.broadcasted_iota(jnp.int32, (w + 1, n), 1)
    dd = jax.lax.broadcasted_iota(jnp.int32, (w + 1, n), 0) + 1
    jpos = kk + dd                               # sorted index of neighbor
    in_range = jpos < n
    jc = jnp.minimum(jpos, n - 1)

    j_lo = slo[jc]                               # (w+1, n, 2)
    j_hi = shi[jc]
    j_act = sact[jc]
    j_dyn = sdyn[jc]
    j_ord = order[jc]

    x_open = j_lo[..., 0] <= shi[None, :, 0]     # sweep condition
    y_overlap = (j_lo[..., 1] <= shi[None, :, 1]) & \
                (slo[None, :, 1] <= j_hi[..., 1])
    ok = (in_range & x_open & y_overlap & sact[None, :] & j_act
          & (sdyn[None, :] | j_dyn))
    pi = jnp.minimum(order[None, :], j_ord)[:w]  # (w, n)
    pj = jnp.maximum(order[None, :], j_ord)[:w]
    valid = ok[:w]

    # Window truncation: if the (w+1)-th neighbor's x-interval still opens
    # before ours closes, pairs beyond the window may have been missed.
    open_last = in_range[w] & x_open[w] & sact & j_act[w]
    missed = open_last.sum(dtype=jnp.int32)

    # merge sweep-lane and long-object-lane candidates
    pi = jnp.concatenate([pi.reshape(-1), d_pi.reshape(-1)])
    pj = jnp.concatenate([pj.reshape(-1), d_pj.reshape(-1)])
    valid = jnp.concatenate([valid.reshape(-1), d_valid.reshape(-1)])
    return _finish(pi, pj, valid, cfg.max_pairs, n_cap=bodies.capacity,
                   ovf_window=missed)


def broadphase_sap_grid(bodies: Bodies, cfg: SimConfig,
                        emit_routing: bool | None = None) -> Pairs:
    """Scanned-window sweep & prune: the two-phase, gather-free XLA form.

    The serial Pallas emission kernel (sweep_emit_v2) pays ~1.1 us of
    scalar-pipeline overhead PER BODY regardless of hits; the original
    windowed XLA sweep (broadphase_sap) pays for (w+1, n) row GATHERS
    (~12 ns/row, serialized on TPU).  This variant has neither:

      phase 1 (vector): ``lax.scan`` over the w window offsets; offset d
        tests ALL bodies against their (d+1)-th sorted forward neighbor
        with contiguous dynamic-slice loads (no gathers).  The carry holds
        per-body hit counts and up to ``sap_hits`` hit positions, updated
        with pure selects.
      phase 2: the usual lex-sort compaction (_finish) — no id
        conversion needed: offset d's target body id ``order[k + d + 1]``
        is a CONTIGUOUS SLICE of ``order``, so the scan stores real body
        ids (not sorted positions) for free.  (The previous form carried
        positions and paid a 65k-element serialized gather to convert the
        survivors; the slice form deletes it — fenced 2026-08-17,
        ~0.5 ms at the 10k bench shape.)

    Hits beyond sap_hits and windows still x-open at offset w are counted
    as overflow, like every other variant.  Pure XLA: vmaps and shards
    (the only broadphase beside n2 that composes with vmap'd env batches).

    ``emit_routing`` (round 5): finalize in SLAB-MAJOR order with the
    TiledRouting byproducts attached, exactly like broadphase_sap_tiled —
    the routing stage operates on the emitted (pi, pj, valid) candidate
    buffer and is sweep-agnostic.  Default None = emit whenever this
    config statically resolves to the tiled solver.
    """
    from phyx_tpu.tiling import (pz_table, resolve_tiled,
                                 routing_bits_ok, slab_dims,
                                 zero_safe_mask)

    n = bodies.capacity
    if emit_routing is None:
        emit_routing = (cfg.tiled_routing
                        and resolve_tiled(cfg, n, 2 * cfg.max_pairs))
    _, _, _, _, n_slabs_s, _ = slab_dims(cfg, n)
    emit_routing = emit_routing and routing_bits_ok(n, n_slabs_s)
    w = min(cfg.sap_window, n - 1)
    H = min(cfg.sap_hits, w)
    k_long = min(cfg.sap_long_k, n)
    lo, hi = compute_aabbs(bodies)
    dynamic = bodies.inv_mass > 0.0
    d_pi, d_pj, d_valid, is_long = _long_object_lane(
        bodies, lo, hi, dynamic, k_long)

    sweep_act = bodies.active & ~is_long
    # banded keys (sweep_band_h > 0): x columns carry the banded sweep
    # (bucket unused here: the grid sweep sorts flat)
    # intervals, y columns stay true (the y test is exact either way);
    # band-boundary crossers are counted into overflow below
    swx_lo, swx_hi, n_cross, _ = banded_x(lo, hi, sweep_act, cfg)
    keys = jnp.where(sweep_act, swx_lo, jnp.float32(jnp.inf))
    banded = cfg.sweep_band_h > 0.0
    stxlo = stxhi = None
    # The sweep columns ride through the sort as payload operands — the
    # carried variadic sort beats (>=32k rows) or ties (16k) argsort +
    # a packed row gather; fenced at five shapes in
    # benches/micro_banded_sort.py (see the CARRY note atop this file).
    tx = (lo[:, 0], hi[:, 0]) if banded else ()
    out = jax.lax.sort(
        (keys, swx_lo, lo[:, 1], swx_hi, hi[:, 1]) + tx +
        (sweep_act.astype(jnp.int32), dynamic.astype(jnp.int32),
         jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    _, sxlo, sylo, sxhi, syhi = out[:5]
    if banded:
        stxlo, stxhi = out[5:7]
    sact = out[-3] > 0
    sdyn = out[-2] > 0
    order = out[-1]

    INF = jnp.float32(jnp.inf)
    xlo_p = jnp.pad(sxlo, (0, w + 1), constant_values=INF)
    ylo_p = jnp.pad(sylo, (0, w + 1), constant_values=INF)
    yhi_p = jnp.pad(syhi, (0, w + 1), constant_values=-INF)
    act_p = jnp.pad(sact, (0, w + 1), constant_values=False)
    dyn_p = jnp.pad(sdyn, (0, w + 1), constant_values=False)
    # target body ids arrive as contiguous slices of the sort permutation
    order_p = jnp.pad(order, (0, w + 1), constant_values=-1)
    # banded: accept on TRUE x overlap too — the banded keys' rounding
    # pad widens intervals by span * 2^-18 world units, which in dense
    # scenes emits spurious same-band candidates that eat the pair
    # budget (VERDICT r3 #2); the padded keys still gate band
    # separation and window/overflow semantics
    txlo_p = jnp.pad(stxlo, (0, w + 1), constant_values=INF) \
        if banded else None
    src_txhi = stxhi

    src_hix = sxhi
    src_loy = sylo
    src_hiy = syhi

    def step_d(carry, d):
        count, tgt = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, d + 1, n)
        ok = ((sl(xlo_p) <= src_hix) & (sl(ylo_p) <= src_hiy)
              & (src_loy <= sl(yhi_p)) & sact & sl(act_p)
              & (sdyn | sl(dyn_p)))
        if banded:
            ok = ok & (sl(txlo_p) <= src_txhi)
        jid = sl(order_p)                    # body id of the d+1 neighbor
        tgt = tuple(
            jnp.where(ok & (count == h), jid, tgt[h]) for h in range(H))
        return (count + ok.astype(jnp.int32), tgt), None

    count0 = jnp.zeros((n,), jnp.int32)
    tgt0 = tuple(jnp.full((n,), -1, jnp.int32) for _ in range(H))
    (count, tgt), _ = jax.lax.scan(
        step_d, (count0, tgt0), jnp.arange(w, dtype=jnp.int32))

    # overflow accounting: hits beyond the H slots + windows still x-open
    dropped = jnp.maximum(count - H, 0).sum(dtype=jnp.int32)
    open_last = ((jax.lax.dynamic_slice_in_dim(xlo_p, w + 1, n) <= src_hix)
                 & sact
                 & jax.lax.dynamic_slice_in_dim(act_p, w + 1, n))
    missed = open_last.sum(dtype=jnp.int32)

    tgt_m = jnp.stack(tgt)                       # (H, n) body ids or -1
    valid = tgt_m >= 0
    src_id = jnp.broadcast_to(order[None, :], (H, n))
    pi = jnp.minimum(src_id, tgt_m)
    pj = jnp.maximum(src_id, tgt_m)

    pi = jnp.concatenate([pi.reshape(-1), d_pi.reshape(-1)])
    pj = jnp.concatenate([pj.reshape(-1), d_pj.reshape(-1)])
    vv = jnp.concatenate([valid.reshape(-1), d_valid.reshape(-1)])
    if not emit_routing:
        return _finish(pi, pj, vv, cfg.max_pairs, n_cap=bodies.capacity,
                       ovf_window=missed, ovf_slots=dropped,
                       ovf_band=n_cross)

    # --- slab-major finalize (round 5, shared shape with sap_tiled's:
    # compact, route the survivors, sort keyed (slab, pi, pj)) ---
    order_n, ranked_cols = _routing_rank_sort(bodies, lo, hi, cfg)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, rank = jax.lax.sort((order_n, iota_n), num_keys=1)
    pz = pz_table(rank, zero_safe_mask(bodies), cfg, n)
    return _finish_slab_major(
        pi, pj, vv, pz, cfg, cfg.max_pairs, n, n_slabs_s,
        order_n, ranked_cols, ovf_window=missed, ovf_slots=dropped,
        ovf_band=n_cross)


def broadphase_sap_kernel(bodies: Bodies, cfg: SimConfig) -> Pairs:
    """Sweep & prune via the vectorized Pallas emission kernel
    (kernels/sweep.py sweep_emit_v2): interval tests run 128 lanes at a
    time, extraction cost tracks actual hits; no candidate grid, no giant
    sort — only the N-key argsort and a max_pairs lex sort."""
    from phyx_tpu.kernels.sweep import sweep_emit_v2

    n = bodies.capacity
    lo, hi = compute_aabbs(bodies)
    keys = jnp.where(bodies.active, lo[:, 0], jnp.float32(jnp.inf))
    iota = jnp.arange(n, dtype=jnp.int32)
    # AABB columns + dyn ride through the sort as payload operands (row
    # gathers are row-serialized on this chip; fenced at five shapes in
    # benches/micro_banded_sort.py — see the CARRY note atop this file)
    _, sxlo, sylo, sxhi, syhi, sdyn, order = jax.lax.sort(
        (keys, lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1],
         (bodies.inv_mass > 0.0).astype(jnp.int32), iota), num_keys=1)
    aabb_sorted = jnp.stack(
        [sxlo, sylo, sxhi, syhi], axis=1).reshape(-1)
    dyn_sorted = sdyn
    nact = bodies.active.sum(dtype=jnp.int32)

    if n % 1024 == 0:
        pi, pj, num, ovf = sweep_emit_v2(aabb_sorted, order, dyn_sorted,
                                         nact, cfg.max_pairs)
    else:
        # tiny capacities: the serial scalar sweep (no 128-lane layout)
        from phyx_tpu.kernels.sweep import sweep_emit
        aabb_flat = jnp.stack(
            [lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], axis=1).reshape(-1)
        dyn = (bodies.inv_mass > 0.0).astype(jnp.int32)
        pi, pj, num, ovf = sweep_emit(aabb_flat, order, dyn, nact,
                                      cfg.max_pairs)
    pi_s, pj_s = lex_sort_pairs(pi, pj, n)
    z = jnp.zeros((), jnp.int32)
    # the emission kernel's single counter is buffer-full drops
    return Pairs(pi=pi_s, pj=pj_s, valid=pi_s != EMPTY, num=num,
                 overflow=ovf, ovf_window=z, ovf_slots=z, ovf_drop=ovf,
                 ovf_band=z, ovf_slab=z)


def _routing_rank_sort(bodies: Bodies, lo, hi, cfg: SimConfig):
    """Body ranking for the slab-major tiled solver: EXACTLY the legacy
    solve-side xorder keys — where(active, banded_lo_x, inf), segmented
    per band when the band-grid layout is static — so slab assignment
    matches the round-4 path body for body (including the k_long widest
    bodies, which the sweep sort parks at +inf but the solver embedding
    must keep at their true x-rank).  The 5 body value columns ride as
    payloads; returns (order (N,) i32, ranked_cols (N, 5) f32)."""
    n = bodies.capacity
    swx_lo, _, _, _ = banded_x(lo, hi, bodies.active, cfg)
    keys = jnp.where(bodies.active, swx_lo, jnp.float32(jnp.inf))
    ids = jnp.arange(n, dtype=jnp.int32)
    cols = (keys, ids,
            bodies.vel[:, 0], bodies.vel[:, 1], bodies.angvel,
            bodies.inv_mass, bodies.inv_inertia)
    if cfg.sweep_band_rows > 0:
        # per-band batched sort — same permutation as segmented_order
        # (ids payload, tail rows appended in index order)
        R, B, X = (cfg.sweep_band_rows, cfg.sweep_band_n,
                   cfg.sweep_band_cols)
        head = X * B * R
        tcols = tuple(
            c[:head].reshape(X, B, R).transpose(1, 0, 2).reshape(B, X * R)
            for c in cols)
        scols = jax.lax.sort(tcols, num_keys=1)
        scols = [jnp.concatenate([s.reshape(-1), c[head:]])
                 for s, c in zip(scols, cols)]
    else:
        scols = jax.lax.sort(cols, num_keys=1)
    return scols[1], jnp.stack(scols[2:], axis=1)


def _sap_tiled_sort_stage(bodies: Bodies, cfg: SimConfig,
                          slab_major: bool = False):
    """Key computation + carried body sort + slab padding for the tiled
    sweep — split out so benches/micro_broadphase_e.py can prefix-time
    the SHIPPED sub-stages (VERDICT r4 #2).  Returns everything
    sweep_emit_tiled consumes plus the long-lane outputs and the band
    overflow count.

    ``slab_major`` (round 5): additionally carry the 5 body VALUE
    columns (vel x/y, angvel, inv_mass, inv_inertia) through the sort
    and return (order_n, ranked_cols) — the tiled solver's embedded
    body table rides this sort for free instead of re-sorting
    (solver.solve_pallas_tiled2)."""
    n = bodies.capacity
    k_long = min(cfg.sap_long_k, n)
    lo, hi = compute_aabbs(bodies)
    dynamic = bodies.inv_mass > 0.0

    d_pi, d_pj, d_valid, is_long = _long_object_lane(
        bodies, lo, hi, dynamic, k_long)

    # --- tiled sweep over the regular bodies in x-sorted position space ---
    sweep_act = bodies.active & ~is_long
    # banded keys (sweep_band_h > 0): each y-band sweeps in its own x
    # region — band-boundary crossers are counted into overflow below
    swx_lo, swx_hi, n_cross, bucket = banded_x(lo, hi, sweep_act, cfg)
    keys = jnp.where(sweep_act, swx_lo, jnp.float32(jnp.inf))
    segmented = cfg.sweep_band_rows > 0
    banded = cfg.sweep_band_h > 0.0

    # The AABB columns + dyn flag ride THROUGH the sort as payload
    # operands instead of argsort + (N, 4) row gather: row gathers are
    # row-serialized on this chip, and the carried variadic sort is ~5x
    # cheaper at mega-scene rows (fenced: benches/micro_banded_sort.py
    # 2026-08-19: 3.30 -> 0.62 ms @ 264k rows, 7.15 -> 2.68 ms @ 1M).
    # x columns carry the (possibly banded) sweep intervals; y columns
    # stay TRUE y (the kernel's y-overlap test is exact either way).
    # Banded sweeps additionally carry the TRUE x interval: the kernel
    # WALKS on the padded banded keys but ACCEPTS on true-x overlap
    # (exact_x), so the rounding pad can never inflate the emitted pair
    # set (VERDICT r3 #2: the pad-inflated candidates saturated config
    # E's pair budget and dropped real pairs).
    ids = jnp.arange(n, dtype=jnp.int32)
    if segmented:
        # Per-band batched sort (config.sweep_band_rows layout): same
        # permutation as the flat argsort when every body is home (see
        # segmented_order); bodies OUTSIDE their home band pair with
        # nothing and are counted into overflow here.  The flat sort
        # parks every non-sweep body past position nact; the segmented
        # sort leaves them inside their segment, so the kernel must see
        # them as EMPTY INTERVALS (lo=+inf, hi=-inf): as a scan STARTER
        # hix=-inf stops the walk at the first row, as a TARGET lo=+inf
        # ends the caller's walk exactly where the disjoint next-band
        # key range would have — and the kernel's row bound becomes the
        # padded length instead of nact.
        ninf = jnp.float32(-jnp.inf)
        cols = (keys,
                jnp.where(sweep_act, swx_lo, jnp.float32(jnp.inf)),
                jnp.where(sweep_act, lo[:, 1], jnp.float32(jnp.inf)),
                jnp.where(sweep_act, swx_hi, ninf),
                jnp.where(sweep_act, hi[:, 1], ninf),
                jnp.where(sweep_act, lo[:, 0], jnp.float32(jnp.inf)),
                jnp.where(sweep_act, hi[:, 0], ninf),
                dynamic.astype(jnp.int32), ids)
        R, B, X = (cfg.sweep_band_rows, cfg.sweep_band_n,
                   cfg.sweep_band_cols)
        head = X * B * R
        tcols = tuple(
            c[:head].reshape(X, B, R).transpose(1, 0, 2).reshape(B, X * R)
            for c in cols)
        scols = jax.lax.sort(tcols, num_keys=1)
        scols = [jnp.concatenate([s.reshape(-1), c[head:]])
                 for s, c in zip(scols, cols)]
        # Layout-contract accounting (ADVICE r3 #1): the home-band check
        # is meaningful only for head rows (tail rows have no segment);
        # active TAIL rows are appended unsorted after the segments,
        # violating the sweep's sorted invariant, so they are counted
        # into the band-overflow too instead of passing silently.
        home = ((ids // R) % B).astype(jnp.float32)
        in_head = ids < head
        n_cross = (n_cross
                   + (sweep_act & in_head & (bucket != home)).sum(
                       dtype=jnp.int32)
                   + (sweep_act & ~in_head).sum(dtype=jnp.int32))
        fill_row = (jnp.inf, jnp.inf, -jnp.inf, -jnp.inf)
    else:
        cols = (keys, swx_lo, lo[:, 1], swx_hi, hi[:, 1],
                lo[:, 0], hi[:, 0],
                dynamic.astype(jnp.int32), ids)
        scols = jax.lax.sort(cols, num_keys=1)
        fill_row = (jnp.inf, jnp.inf, jnp.inf, jnp.inf)
    _, sxlo, sylo, sxhi, syhi, stxlo, stxhi, sdyn, order = scols
    # slab-major routing rank: a SEPARATE sort on the solver's legacy
    # xorder keys — where(active, banded_lo_x, inf) — NOT this sweep's
    # keys, which park the k_long widest bodies (dense lane) at +inf
    # and would mis-rank them for the body embedding.  The body value
    # columns ride along for the solver's embedded table.
    routing_sorted = _routing_rank_sort(bodies, lo, hi, cfg) \
        if slab_major else None
    nact = sweep_act.sum(dtype=jnp.int32)

    K = -(-cfg.tile_stride // 1024) * 1024     # i32 DMA tiling
    W = K + max(1024, -(-cfg.tile_halo // 1024) * 1024)
    n_slabs = max(1, -(-n // K))
    npad = (n_slabs - 1) * K + W
    if segmented:
        nact = jnp.int32(npad)
    pad4 = jnp.tile(jnp.array(fill_row, jnp.float32), (npad - n, 1)) \
        if npad > n else jnp.zeros((0, 4), jnp.float32)
    aabb_sorted = jnp.concatenate(
        [jnp.stack([sxlo, sylo, sxhi, syhi], axis=1), pad4]).reshape(-1)
    dyn_sorted = jnp.concatenate(
        [sdyn, jnp.zeros(npad - n, jnp.int32)])
    # the kernel emits BODY IDS straight from the order window (two SMEM
    # loads per emitted pair) — converting positions afterwards costs two
    # row-serialized max_pairs-element gathers
    order_sorted = jnp.concatenate(
        [order, jnp.full(npad - n, EMPTY, jnp.int32)])

    mp = -(-cfg.max_pairs // 1024) * 1024
    if banded:
        pad2 = jnp.tile(jnp.array([jnp.inf, -jnp.inf], jnp.float32),
                        (npad - n, 1)) if npad > n \
            else jnp.zeros((0, 2), jnp.float32)
        truex_sorted = jnp.concatenate(
            [jnp.stack([stxlo, stxhi], axis=1), pad2]).reshape(-1)
    else:
        truex_sorted = None
    return (aabb_sorted, dyn_sorted, order_sorted, truex_sorted, nact,
            n_slabs, K, W, mp, n_cross, d_pi, d_pj, d_valid,
            routing_sorted)


def broadphase_sap_tiled(bodies: Bodies, cfg: SimConfig,
                         emit_routing: bool | None = None) -> Pairs:
    """Sweep & prune for scenes beyond the plain kernel's SMEM envelope:
    x-sorted AABB windows are DMA'd per slab and pairs stream to HBM
    (kernels/sweep.py sweep_emit_tiled).  Long bodies use the dense lane
    (same as the windowed sweep) since a slab window cannot span them.

    ``emit_routing`` (round 5): finalize pairs in SLAB-MAJOR order —
    keyed (slab, pi, pj) instead of (pi, pj) — and attach the
    TiledRouting byproducts so the tiled solver needs no routing sorts.
    Within a slab the order is still (pi, pj) ascending, i.e. exactly
    the order the round-4 solver's stable routing sort produced from
    (pi, pj)-finalized pairs, so the solver's Gauss-Seidel visit order
    is unchanged.  Default None = emit whenever this config statically
    resolves to the tiled solver (callers with user joints pass False:
    the jointed tiled path keeps the round-4 kernel)."""
    from phyx_tpu.kernels.sweep import sweep_emit_tiled
    from phyx_tpu.tiling import (pz_table, resolve_tiled,
                                 routing_bits_ok, slab_dims,
                                 zero_safe_mask)

    n = bodies.capacity
    if emit_routing is None:
        emit_routing = (cfg.tiled_routing
                        and resolve_tiled(cfg, n, 2 * cfg.max_pairs))
    _, _, _, _, n_slabs_s, _ = slab_dims(cfg, n)
    emit_routing = emit_routing and routing_bits_ok(n, n_slabs_s)

    (aabb_sorted, dyn_sorted, order_sorted, truex_sorted, nact,
     n_slabs, K, W, mp, n_cross, d_pi, d_pj, d_valid, routing_sorted) = \
        _sap_tiled_sort_stage(bodies, cfg, slab_major=emit_routing)
    if truex_sorted is not None:
        ppi, ppj, num_k, ovf_d, ovf_w = sweep_emit_tiled(
            aabb_sorted, dyn_sorted, order_sorted, nact, mp, n_slabs,
            K, W, truex_sorted=truex_sorted, exact_x=True)
    else:
        ppi, ppj, num_k, ovf_d, ovf_w = sweep_emit_tiled(
            aabb_sorted, dyn_sorted, order_sorted, nact, mp, n_slabs,
            K, W)
    slot = jnp.arange(mp, dtype=jnp.int32)
    live = slot < num_k
    a = jnp.where(live, ppi, EMPTY)
    b = jnp.where(live, ppj, EMPTY)
    ki = jnp.minimum(a, b)
    kj = jnp.maximum(a, b)

    pi = jnp.concatenate([ki, d_pi.reshape(-1)])
    pj = jnp.concatenate([kj, d_pj.reshape(-1)])
    valid = jnp.concatenate([live, d_valid.reshape(-1)])
    if not emit_routing:
        return _finish(pi, pj, valid, cfg.max_pairs, n_cap=n,
                       ovf_window=ovf_w, ovf_drop=ovf_d, ovf_band=n_cross)

    # --- slab-major finalize (round 5) ---
    order_n, ranked_cols = routing_sorted
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, rank = jax.lax.sort((order_n, iota_n), num_keys=1)
    pz = pz_table(rank, zero_safe_mask(bodies), cfg, n)
    return _finish_slab_major(
        pi, pj, valid, pz, cfg, cfg.max_pairs, n, n_slabs_s,
        order_n, ranked_cols, ovf_window=ovf_w, ovf_drop=ovf_d,
        ovf_band=n_cross)


def suggest_sap_window(bodies: Bodies, percentile: float = 99.9,
                       margin: float = 1.5, exclude_long_k: int = 8,
                       cfg: SimConfig | None = None) -> int:
    """Host-side window-sizing policy for the windowed/grid sweeps
    (SURVEY.md §7 hard part #1: budget sizing from scene statistics).

    Measures every body's forward x-neighbor span on the CURRENT state
    (count of subsequent x-sorted bodies whose interval opens before this
    body's closes), excluding the ``exclude_long_k`` widest bodies (they
    use the dense lane), and returns ``percentile`` of the distribution
    times ``margin``.  Neighborhoods grow as scenes compact — keep
    watching ``stats.pair_overflow`` (or run under debug.checked_rollout),
    and resize when it fires.

    Pass ``cfg`` when the sweep runs on BANDED keys (sweep_band_h > 0):
    the spans are then measured on the banded x-keys the sweep actually
    walks.  Measuring raw ``lo[:, 0]`` on a band-grid mega-scene sees
    all y-bands interleaved and over-sizes the window ~bands-fold
    (VERDICT r3 weak #4: settled config E read 3080 where the per-band
    answer is ~200 — an ``--autotune`` consuming that would explode).
    """
    import numpy as np

    lo, hi = compute_aabbs(bodies)
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    act = np.asarray(bodies.active).copy()
    if not act.any():
        return 16
    ext = np.where(act, hi[:, 0] - lo[:, 0], -np.inf)
    act[np.argsort(-ext)[:exclude_long_k]] = False
    xlo = lo[act, 0].astype(np.float64)
    xhi = hi[act, 0].astype(np.float64)
    if cfg is not None and cfg.sweep_band_h > 0.0:
        # spans on the banded keys (f64 on host: the statistic needs no
        # pad and must not itself suffer the offset-add rounding)
        b = np.floor((lo[act, 1] - cfg.sweep_band_y0) / cfg.sweep_band_h)
        off = b * float(cfg.sweep_band_span)
        xlo = xlo + off
        xhi = xhi + off
    srt = np.argsort(xlo)
    xlo = xlo[srt]
    xhi = xhi[srt]
    span = np.searchsorted(xlo, xhi, side="right") \
        - np.arange(xlo.shape[0]) - 1
    w = float(np.percentile(span, percentile)) * margin
    return max(8, int(np.ceil(w)))


def suggest_sap_hits(bodies: Bodies, margin: int = 4,
                     exclude_long_k: int = 8,
                     cfg: SimConfig | None = None) -> int:
    """Host-side hit-slot sizing for the grid sweep (``cfg.sap_hits``).

    Measures every body's count of TRUE forward hits on the current
    state — forward x-sorted neighbors whose AABB overlaps in both axes
    (and band, when ``cfg`` sweeps banded keys) — excluding the
    ``exclude_long_k`` widest bodies (dense lane), and returns the MAX
    plus ``margin``.  Unlike the window (p99.9 suffices: truncation is
    counted), hit-slot spill DROPS real pairs into ovf_slots, so the
    policy sizes for the maximum.  Round-5 fence that motivated this:
    settled 1024-env config E spills 14224 hits at H=8 and 10160 at
    H=12 (the tail across 1024 piles is deeper than one 10k pile's,
    where H=8 never spills); see BASELINE.md round-5 notes."""
    import numpy as np

    lo, hi = compute_aabbs(bodies)
    lo = np.asarray(lo).astype(np.float64)
    hi = np.asarray(hi).astype(np.float64)
    act = np.asarray(bodies.active).copy()
    if not act.any():
        return 8
    ext = np.where(act, hi[:, 0] - lo[:, 0], -np.inf)
    act[np.argsort(-ext)[:exclude_long_k]] = False
    xlo, xhi = lo[act, 0], hi[act, 0]
    ylo, yhi = lo[act, 1], hi[act, 1]
    if cfg is not None and cfg.sweep_band_h > 0.0:
        b = np.floor((lo[act, 1] - cfg.sweep_band_y0) / cfg.sweep_band_h)
        off = b * float(cfg.sweep_band_span)
        xlo = xlo + off
        xhi = xhi + off
    srt = np.argsort(xlo, kind="stable")
    xlo, xhi, ylo, yhi = xlo[srt], xhi[srt], ylo[srt], yhi[srt]
    m = xlo.shape[0]
    ends = np.searchsorted(xlo, xhi, side="right")
    best = 0
    for i in range(m):
        e = ends[i]
        if e - i - 1 <= best:
            continue
        hits = int(((ylo[i + 1:e] <= yhi[i])
                    & (ylo[i] <= yhi[i + 1:e])).sum())
        if hits > best:
            best = hits
    return best + margin


def _sweep_kernel_smem_bytes(n: int, max_pairs: int) -> int:
    """SMEM of sweep_emit: aabb (N*4 f32), order/dyn (N i32 each), nact,
    pi/pj (max_pairs i32 each) + counters."""
    return 4 * (6 * n + 2 * max_pairs + 8)


def broadphase(bodies: Bodies, cfg: SimConfig,
               tiled_routing: bool | None = None) -> Pairs:
    """``tiled_routing``: slab-major finalize control for the tiled
    sweep variants — None = auto (emit whenever the config statically
    resolves to the tiled solver), False = never (jointed scenes: the
    joint-pair exclusion re-sorts the buffer)."""
    if cfg.broadphase == "n2":
        return broadphase_n2(bodies, cfg)
    if cfg.broadphase == "sap_kernel":
        return broadphase_sap_kernel(bodies, cfg)
    if cfg.broadphase == "sap_grid":
        return broadphase_sap_grid(bodies, cfg, emit_routing=tiled_routing)
    if cfg.broadphase == "sap_tiled":
        return broadphase_sap_tiled(bodies, cfg, emit_routing=tiled_routing)
    if cfg.broadphase == "sap_window":
        return broadphase_sap(bodies, cfg)
    if cfg.solver_backend == "pallas_tiled":
        return broadphase_sap_tiled(bodies, cfg, emit_routing=tiled_routing)
    if cfg.solver_backend == "pallas":
        if _sweep_kernel_smem_bytes(bodies.capacity, cfg.max_pairs) \
                <= 900 * 1024:
            return broadphase_sap_kernel(bodies, cfg)
        return broadphase_sap_tiled(bodies, cfg, emit_routing=tiled_routing)
    # XLA fallback: the scanned-window grid strictly dominates the gather-
    # based windowed sweep (same window semantics and overflow accounting,
    # no serialized row gathers) and composes with vmap.
    return broadphase_sap_grid(bodies, cfg)
