"""Contact cache: cross-frame impulse persistence (warm starting).

TPU-native rebuild of the reference's per-pair Manifold cache
(SURVEY.md §2 C5): the C++ engine keeps a hash map of Manifolds and matches
new contact points to old ones by feature id so accumulated impulses carry
over frames.  Here the cache is a fixed-capacity SoA table sorted
lexicographically by ``(pi, pj)``; the per-frame join from the fresh
(lex-sorted) pair buffer is a fixed-depth vectorized binary search, entirely
on device (BASELINE.json:5 "contact caching ... fully on TPU").

Two int32 key columns (not a fused ``i*N+j`` key) keep this correct at
100k+ bodies without int64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from phyx_tpu.broadphase import EMPTY, Pairs
from phyx_tpu.narrowphase import Contacts
from phyx_tpu.types import ContactCache


def lex_searchsorted(ka: jax.Array, kb: jax.Array,
                     qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Vectorized lower-bound binary search on two lex-ordered key columns.

    (ka, kb) must be sorted by (ka, then kb).  Returns for each query
    (qa, qb) the first index where (ka, kb) >= (qa, qb).
    """
    n = ka.shape[0]
    lo = jnp.zeros(qa.shape, jnp.int32)
    hi = jnp.full(qa.shape, n, jnp.int32)
    steps = max(1, n.bit_length())

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) >> 1
        midc = jnp.minimum(mid, n - 1)
        less = (ka[midc] < qa) | ((ka[midc] == qa) & (kb[midc] < qb))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def lex_join(ka: jax.Array, kb: jax.Array,
             qa: jax.Array, qb: jax.Array, n_cap: int | None = None):
    """Sort-merge join of two lex-sorted two-column key tables.

    Returns ``(idx, hit)`` per query: the row of (ka, kb) holding the same
    key, and whether it exists.  Keys are unique within each table; EMPTY
    keys never match.  Costs two lex sorts of (P+Q) rows — measured ~6x
    cheaper on TPU than the per-query binary search (lex_searchsorted),
    whose serialized row gathers dominate (9.3 ms vs ~1.5 ms at 40k+40k).

    ``n_cap`` (max key value bound, i.e. body capacity) enables key
    packing (round 3): the TPU sort's cost scales with the number of key
    columns, so (a, b, tag) packs into ONE int32 key when
    ``2*bits + 1 <= 31`` (10k/20k capacities) and (b, tag) into one
    column otherwise; the routing sort's (tag, pay) always packs.  The
    final (idx, hit) is unchanged: the packing is strictly monotone on
    valid rows, EMPTY rows all land at int32-max where their mutual
    order is irrelevant (the routing sort orders them totally by
    (tag, pay) anyway, and ``hit`` guards on a_s != EMPTY).

    Precondition (all call sites satisfy it): valid rows are canonical
    pairs with ``a < b < n_cap`` — in particular a == b == n_cap-1 is
    impossible, which keeps the fully-packed key strictly below the
    EMPTY sentinel at bits == 15 (the 20k capacity).
    """
    p = ka.shape[0]
    q = qa.shape[0]
    a = jnp.concatenate([ka, qa])
    b = jnp.concatenate([kb, qb])
    # single payload (tag << pbits) | pay: carries the true source tag
    # through every branch AND is the routing-sort key verbatim — unique
    # by construction ((tag, pay) is unique), so the routing order is the
    # exact (tag, pay) lex order of the unpacked form
    pbits = max(1, int(max(p, q) - 1).bit_length())
    tag = jnp.concatenate([jnp.zeros(p, jnp.int32), jnp.ones(q, jnp.int32)])
    pay = jnp.concatenate([jnp.arange(p, dtype=jnp.int32),
                           jnp.arange(q, dtype=jnp.int32)])
    pay2 = (tag << pbits) | pay
    bits = max(1, int(n_cap - 1).bit_length()) if n_cap else 99
    empty = a == EMPTY
    if 2 * bits + 1 <= 31:
        # (a, b, tag) -> one key; EMPTY rows to the top sentinel (their
        # mutual order is irrelevant: hit_here guards on a_s != EMPTY and
        # the routing key below orders them totally)
        key = jnp.where(empty, jnp.int32(EMPTY),
                        (((a << bits) | b) << 1) | tag)
        key_s, pay2_s = jax.lax.sort((key, pay2), num_keys=1)
        e = key_s == jnp.int32(EMPTY)
        a_s = jnp.where(e, EMPTY, key_s >> (bits + 1))
        b_s = jnp.where(e, EMPTY,
                        (key_s >> 1) & jnp.int32((1 << bits) - 1))
    elif bits + 1 <= 31:
        # (b, tag) -> one column: the 3-key sort becomes 2-key (100k+,
        # mega-scene).  EMPTY rows sentinel both columns; among equal
        # (a=EMPTY, bt=EMPTY) rows order is irrelevant as above.
        bt = jnp.where(empty, jnp.int32(EMPTY), (b << 1) | tag)
        a_s, bt_s, pay2_s = jax.lax.sort((a, bt, pay2), num_keys=2)
        e = a_s == EMPTY
        b_s = jnp.where(e, EMPTY, bt_s >> 1)
    else:
        a_s, b_s, _, pay2_s = jax.lax.sort((a, b, tag, pay2), num_keys=3)
    tag_s = pay2_s >> pbits
    pay_s = pay2_s & jnp.int32((1 << pbits) - 1)
    # a query's matching table row (if any) sorts immediately before it
    hit_here = ((tag_s == 1)
                & (jnp.roll(tag_s, 1) == 0)
                & (jnp.roll(a_s, 1) == a_s)
                & (jnp.roll(b_s, 1) == b_s)
                & (a_s != EMPTY))
    idx_here = jnp.roll(pay_s, 1)
    # route per-query results back to query order: tag-0 rows first, then
    # tag-1 rows by query index — pay2 IS that key, already one column
    _, hit_q, idx_q = jax.lax.sort(
        (pay2_s, hit_here.astype(jnp.int32), idx_here), num_keys=1)
    hit = hit_q[p:].astype(bool)
    idx = jnp.where(hit, idx_q[p:], 0)
    return idx, hit


def warm_start_from_cache(contacts: Contacts, pairs: Pairs,
                          cache: ContactCache,
                          n_cap: int | None = None) -> Contacts:
    """Fill contacts.warm_n / warm_t from the previous frame's cache.

    Contact ``2p+k`` belongs to pair-slot ``p``; we look the pair up in the
    sorted cache and match each point's feature id against the (up to two)
    cached feature ids of that pair.
    """
    P = pairs.pi.shape[0]
    posc, hit = lex_join(cache.pi, cache.pj, pairs.pi, pairs.pj,
                         n_cap=n_cap)

    # cached per-pair data, per pair-slot — ONE packed row gather (row
    # gathers are row-serialized on TPU).  fid rides along VALUE-converted
    # to f32 (exact for |fid| < 2^24), NOT bitcast: fid == -1 bitcasts to
    # a NaN payload and TPU canonicalizes NaN bits in data movement
    # (measured 2026-08-17: bitcast here silently killed warm starting on
    # TPU while CPU tests stayed green).
    tbl = jnp.concatenate([
        cache.fid.astype(jnp.float32),
        cache.normal_impulse, cache.friction_impulse], axis=1)   # (P, 6)
    g = tbl[posc]
    cfid = g[:, 0:2].astype(jnp.int32)                           # (P, 2)
    cn = g[:, 2:4]                                               # (P, 2)
    ct = g[:, 4:6]                                               # (P, 2)

    # expand to contact slots (2 per pair)
    fid = contacts.fid.reshape(P, 2)       # (P, 2) fresh feature ids
    match0 = (fid == cfid[:, 0:1]) & hit[:, None] & (fid >= 0)
    match1 = (fid == cfid[:, 1:2]) & hit[:, None] & (fid >= 0)
    warm_n = jnp.where(match0, cn[:, 0:1], jnp.where(match1, cn[:, 1:2], 0.0))
    warm_t = jnp.where(match0, ct[:, 0:1], jnp.where(match1, ct[:, 1:2], 0.0))

    return contacts.replace(
        warm_n=warm_n.reshape(-1).astype(jnp.float32),
        warm_t=warm_t.reshape(-1).astype(jnp.float32),
    )


def build_cache(contacts: Contacts, pairs: Pairs,
                accum_n: jax.Array, accum_t: jax.Array) -> ContactCache:
    """Store this frame's accumulated impulses keyed by (pair, feature id).

    The pair buffer is already lex-sorted with EMPTY slots last, so the new
    cache is simply the positional re-grouping of the flat contact arrays.
    """
    P = pairs.pi.shape[0]
    valid = contacts.valid.reshape(P, 2)
    fid = jnp.where(valid, contacts.fid.reshape(P, 2), -1)
    return ContactCache(
        pi=pairs.pi,
        pj=pairs.pj,
        fid=fid,
        normal_impulse=jnp.where(valid, accum_n.reshape(P, 2), 0.0),
        friction_impulse=jnp.where(valid, accum_t.reshape(P, 2), 0.0),
    )
