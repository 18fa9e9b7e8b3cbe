"""lex_join key-packing equivalence (round 3).

The cache join's sorts pack key columns by capacity class:
  * 2*bits+1 <= 31  -> (a, b, tag) in ONE int32 key  (10k/20k capacities)
  * bits+1   <= 31  -> (b, tag) fused, 2-key sort    (100k+/mega)
  * otherwise       -> the original 3-key sort
All three must return the exact (idx, hit) of the reference
implementation for every query.
"""

import numpy as np

import jax.numpy as jnp

from phyx_tpu.broadphase import EMPTY
from phyx_tpu.cache import lex_join


def _reference_join(ka, kb, qa, qb):
    table = {}
    for i, (a, b) in enumerate(zip(ka, kb)):
        if a != EMPTY:
            table[(int(a), int(b))] = i
    idx = np.zeros(len(qa), np.int32)
    hit = np.zeros(len(qa), bool)
    for j, (a, b) in enumerate(zip(qa, qb)):
        if a != EMPTY and (int(a), int(b)) in table:
            hit[j] = True
            idx[j] = table[(int(a), int(b))]
    return idx, hit


def _random_keys(rng, cap, n, frac_empty):
    a = rng.integers(0, cap, n).astype(np.int32)
    b = rng.integers(0, cap, n).astype(np.int32)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    emp = rng.random(n) < frac_empty
    lo = np.where(emp, EMPTY, lo)
    hi = np.where(emp, EMPTY, hi)
    # lex-sort with EMPTY last, dedupe (join precondition: unique keys)
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    keep = np.ones(n, bool)
    keep[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    lo = np.where(keep, lo, EMPTY)
    hi = np.where(keep, hi, EMPTY)
    order = np.lexsort((hi, lo))
    return lo[order], hi[order]


def test_lex_join_matches_reference_all_capacity_classes():
    rng = np.random.default_rng(3)
    for cap, n in [(64, 200), (16384, 3000), (32768, 3000),
                   (1 << 17, 3000), (1 << 20, 3000)]:
        ka, kb = _random_keys(rng, cap, n, 0.3)
        qa, qb = _random_keys(rng, cap, n + 512, 0.4)
        # force some guaranteed hits, then re-dedupe (the join requires
        # unique keys within each table) and re-sort
        qa[:50], qb[:50] = ka[:50], kb[:50]
        order = np.lexsort((qb, qa))
        qa, qb = qa[order], qb[order]
        keep = np.ones(len(qa), bool)
        keep[1:] = (qa[1:] != qa[:-1]) | (qb[1:] != qb[:-1])
        qa = np.where(keep, qa, EMPTY)
        qb = np.where(keep, qb, EMPTY)
        order = np.lexsort((qb, qa))
        qa, qb = qa[order], qb[order]
        ridx, rhit = _reference_join(ka, kb, qa, qb)
        for n_cap in (cap, None):
            idx, hit = lex_join(jnp.array(ka), jnp.array(kb),
                                jnp.array(qa), jnp.array(qb), n_cap=n_cap)
            assert (np.asarray(hit) == rhit).all(), (cap, n_cap)
            assert (np.asarray(idx)[rhit] == ridx[rhit]).all(), (cap, n_cap)


def test_lex_join_all_empty_table():
    ka = np.full(64, EMPTY, np.int32)
    qa = np.array([1, 2, EMPTY, EMPTY] + [EMPTY] * 60, np.int32)
    qb = np.array([2, 3, EMPTY, EMPTY] + [EMPTY] * 60, np.int32)
    for n_cap in (1024, 1 << 17, None):
        _, hit = lex_join(jnp.array(ka), jnp.array(ka),
                          jnp.array(qa), jnp.array(qb), n_cap=n_cap)
        assert not bool(np.asarray(hit).any())
