"""Banded sweep keys (config.sweep_band_h) — pair-set and trajectory
equivalence on a band-grid mega-scene (SURVEY §5.7 / config E layout).

The banded tiled sweep must find exactly the contacts the plain sweep
finds (candidate supersets within a band are allowed — narrowphase
rejects them), must never pair across bands, and must count any
band-boundary-crossing body into pair overflow instead of silently
missing its pairs.
"""

import numpy as np

import jax.numpy as jnp

from phyx_tpu.broadphase import EMPTY, broadphase_sap_tiled, compute_aabbs
from phyx_tpu.config import SimConfig
from phyx_tpu.parallel.envs import concat_envs
from phyx_tpu import scenes


def _grid_state(cfg, n_envs=8, boxes=24, y_bands=4):
    builders = [scenes.pile(cfg, boxes, seed=s, ground_half=8.0)
                for s in range(n_envs)]
    mega, _, _ = concat_envs(builders, cfg, band_width=40.0,
                             y_bands=y_bands, band_height=120.0)
    return mega.build()


def _cfgs():
    base = dict(max_bodies=1024, max_pairs=4096, broadphase="sap_tiled",
                sap_long_k=4, solver_backend="xla")
    plain = SimConfig(**base)
    banded = SimConfig(**base, sweep_band_h=120.0, sweep_band_y0=-60.0,
                       sweep_band_span=256.0)
    return plain, banded


def _true_overlaps(state):
    lo, hi = map(np.asarray, compute_aabbs(state.bodies))
    act = np.asarray(state.bodies.active)
    dyn = np.asarray(state.bodies.inv_mass) > 0
    out = set()
    n = act.sum()
    for i in range(n):
        for j in range(i + 1, n):
            if not (act[i] and act[j]) or not (dyn[i] or dyn[j]):
                continue
            if (lo[i, 0] <= hi[j, 0] and lo[j, 0] <= hi[i, 0]
                    and lo[i, 1] <= hi[j, 1] and lo[j, 1] <= hi[i, 1]):
                out.add((i, j))
    return out


def _sets(pairs):
    pi, pj = np.asarray(pairs.pi), np.asarray(pairs.pj)
    return {(int(a), int(b)) for a, b in zip(pi, pj) if a != EMPTY}


def test_banded_tiled_sweep_finds_all_true_pairs():
    plain, banded = _cfgs()
    st = _grid_state(plain)
    truth = _true_overlaps(st)
    got_plain = _sets(broadphase_sap_tiled(st.bodies, plain))
    got_banded = _sets(broadphase_sap_tiled(st.bodies, banded))
    # every true overlap found by both; banded never invents cross-band
    # pairs beyond AABB-test supersets of the plain form's candidates
    assert truth <= got_plain
    assert truth <= got_banded
    # supersets come only from the x' rounding pad: tiny
    assert len(got_banded - got_plain) <= len(truth) // 4 + 2
    # no invented pair lacks y-band compatibility
    ylo = np.asarray(compute_aabbs(st.bodies)[0])[:, 1]
    for a, b in got_banded:
        ba = np.floor((ylo[a] + 60.0) / 120.0)
        bb = np.floor((ylo[b] + 60.0) / 120.0)
        assert ba == bb, (a, b)


def test_banded_trajectory_matches_plain():
    """Full rollout parity: contacts (not just candidates) drive physics.

    Pallas backend: BIT-exact — narrowphase emits contacts only at
    separation <= 0, so the pad-induced extra candidates die there, and
    the stable valid-first compaction preserves the sweep order of the
    surviving contacts exactly.  XLA backend: convergence-level only
    (coloring keys off pair-slot indices, which the extra candidate
    slots shift — same contract as tiled-vs-fused parity)."""
    from phyx_tpu.step import rollout

    plain, banded = _cfgs()
    st = _grid_state(plain)
    act = np.asarray(st.bodies.active)

    a = rollout(st, plain, 40)
    b = rollout(st, banded, 40)
    np.testing.assert_allclose(np.asarray(a.bodies.pos)[act],
                               np.asarray(b.bodies.pos)[act], atol=5e-2)
    assert int(b.stats.pair_overflow) == 0
    assert not np.isnan(np.asarray(b.bodies.pos)).any()

    pp = plain.replace(solver_backend="pallas")
    bp = banded.replace(solver_backend="pallas")
    ap = rollout(st, pp, 20)
    bb = rollout(st, bp, 20)
    assert (np.asarray(ap.bodies.pos)[act]
            == np.asarray(bb.bodies.pos)[act]).all()
    assert int(ap.stats.num_contacts) == int(bb.stats.num_contacts)
    assert float(ap.stats.max_penetration) \
        == float(bb.stats.max_penetration)


def test_banded_sap_grid_finds_all_true_pairs():
    """Banding also applies to the scanned-window XLA grid (the vmap- and
    shard-safe variant): same completeness + cross-band-impossible
    guarantees as the tiled form."""
    from phyx_tpu.broadphase import broadphase_sap_grid

    plain, banded = _cfgs()
    # a ground (half-extent 8) overlaps ~24 boxes and the plain sweep
    # walks all 4 interleaved y-bands: budget window/hits for that
    plain = plain.replace(broadphase="sap_grid", sap_window=192,
                          sap_hits=48)
    banded = banded.replace(broadphase="sap_grid", sap_window=192,
                            sap_hits=48)
    st = _grid_state(plain)
    truth = _true_overlaps(st)
    got_plain = _sets(broadphase_sap_grid(st.bodies, plain))
    got_banded = _sets(broadphase_sap_grid(st.bodies, banded))
    assert truth <= got_plain
    assert truth <= got_banded
    ylo = np.asarray(compute_aabbs(st.bodies)[0])[:, 1]
    for a, b in got_banded:
        assert np.floor((ylo[a] + 60.0) / 120.0) \
            == np.floor((ylo[b] + 60.0) / 120.0), (a, b)


def test_band_boundary_crosser_counted():
    """A body whose AABB crosses a band boundary fires the overflow
    counter (its pairs may be missed by the banded sweep — no silent
    loss)."""
    plain, banded = _cfgs()
    st = _grid_state(plain)
    # move one dynamic body onto a band boundary (y = -60 + k*120)
    pos = np.asarray(st.bodies.pos).copy()
    idx = int(np.argmax(np.asarray(st.bodies.inv_mass) > 0))
    pos[idx] = (0.0, 60.0)     # half-extent ~0.5 straddles the y=60 line
    st = st.replace(bodies=st.bodies.replace(pos=jnp.array(pos)))
    got = broadphase_sap_tiled(st.bodies, banded)
    assert int(got.overflow) >= 1
    plain_got = broadphase_sap_tiled(st.bodies, plain)
    assert int(plain_got.overflow) == 0


def _seg_cfg(banded):
    # 8 envs x 24 boxes, y_bands=4: R=25 rows/env, B=4 bands, X=2 cells
    return banded.replace(sweep_band_rows=25, sweep_band_n=4,
                          sweep_band_cols=2)


def test_segmented_sort_pairs_bit_identical():
    """Per-band batched sort (config.sweep_band_rows) emits the exact
    same Pairs buffer as the flat banded sort when every body sits in
    its home band — _finish's lex sort canonicalizes pair order, so the
    arrays must match bit-for-bit."""
    plain, banded = _cfgs()
    seg = _seg_cfg(banded)
    st = _grid_state(plain)
    a = broadphase_sap_tiled(st.bodies, banded)
    b = broadphase_sap_tiled(st.bodies, seg)
    assert (np.asarray(a.pi) == np.asarray(b.pi)).all()
    assert (np.asarray(a.pj) == np.asarray(b.pj)).all()
    assert int(a.num) == int(b.num)
    assert int(a.overflow) == int(b.overflow) == 0


def test_segmented_order_matches_flat_argsort():
    """On home-banded keys the segmented order IS the flat argsort
    permutation (disjoint band key ranges + stable sorts)."""
    from phyx_tpu.broadphase import segmented_order

    plain, banded = _cfgs()
    seg = _seg_cfg(banded)
    st = _grid_state(plain)
    lo, hi = compute_aabbs(st.bodies)
    from phyx_tpu.broadphase import banded_x
    swx_lo, _, _, _ = banded_x(lo, hi, st.bodies.active, seg)
    # exclude inf keys from the comparison: ties between +inf rows sort
    # by index globally in the flat form but per-segment in the
    # segmented form (both orderings are dead rows; pair sets identical)
    keys = np.asarray(jnp.where(st.bodies.active, swx_lo,
                                jnp.float32(jnp.inf)))
    got = np.asarray(segmented_order(jnp.asarray(keys), seg))
    ref = np.argsort(keys, kind="stable")
    nfin = int(np.isfinite(keys).sum())
    assert (got[:nfin] == ref[:nfin]).all()


def test_segmented_rollout_bit_identical():
    """Step-level equivalence on the Pallas path: segmented-broadphase
    rollouts reproduce the flat banded rollout bit-for-bit (same pair
    buffer in, same everything out)."""
    from phyx_tpu.step import rollout

    plain, banded = _cfgs()
    st = _grid_state(plain)
    bp = banded.replace(solver_backend="pallas")
    sp = _seg_cfg(banded).replace(solver_backend="pallas")
    a = rollout(st, bp, 20)
    b = rollout(st, sp, 20)
    act = np.asarray(st.bodies.active)
    assert (np.asarray(a.bodies.pos)[act]
            == np.asarray(b.bodies.pos)[act]).all()
    assert float(a.stats.max_penetration) == float(b.stats.max_penetration)
    assert int(b.stats.pair_overflow) == 0


def test_segmented_drifter_counted():
    """A body that moved FULLY into another band (no boundary crossing)
    pairs correctly under the flat banded sort (overflow 0) but cannot
    be placed by the static segment layout — the segmented sweep must
    count it into overflow instead of silently dropping its pairs."""
    plain, banded = _cfgs()
    seg = _seg_cfg(banded)
    st = _grid_state(plain)
    pos = np.asarray(st.bodies.pos).copy()
    idx = int(np.argmax(np.asarray(st.bodies.inv_mass) > 0))
    # band centers are y = k*120 (bucket boundaries at -60 + k*120):
    # y=120 is fully inside bucket 1 for a half-extent ~0.5 box
    pos[idx] = (pos[idx][0], 120.0)
    st = st.replace(bodies=st.bodies.replace(pos=jnp.array(pos)))
    flat_got = broadphase_sap_tiled(st.bodies, banded)
    seg_got = broadphase_sap_tiled(st.bodies, seg)
    assert int(flat_got.overflow) == 0
    assert int(seg_got.overflow) >= 1


def test_segmented_tiled_solver_bit_identical():
    """The tiled SOLVER's slab order also uses the segmented sort when
    configured (step.py xorder): forced onto the tiled backend, the
    segmented run reproduces the flat banded run bit-for-bit (identical
    permutation while bodies are home)."""
    import jax
    from phyx_tpu import solver
    from phyx_tpu import step as step_mod

    plain, banded = _cfgs()
    bp = banded.replace(solver_backend="pallas",
                        tile_stride=256, tile_halo=256)
    sp = _seg_cfg(bp)
    st0 = _grid_state(plain)

    orig_f = solver.pallas_smem_bytes
    orig_s = solver.pallas_streamed_smem_bytes
    solver.pallas_smem_bytes = lambda n, c: 10 ** 9
    solver.pallas_streamed_smem_bytes = lambda n: 10 ** 9
    jax.clear_caches()
    try:
        a, b = st0, st0
        for _ in range(10):
            a = step_mod.step(a, bp)
            b = step_mod.step(b, sp)
    finally:
        solver.pallas_smem_bytes = orig_f
        solver.pallas_streamed_smem_bytes = orig_s
        jax.clear_caches()
    act = np.asarray(st0.bodies.active)
    assert (np.asarray(a.bodies.pos)[act]
            == np.asarray(b.bodies.pos)[act]).all()
    assert int(b.stats.pair_overflow) == 0
