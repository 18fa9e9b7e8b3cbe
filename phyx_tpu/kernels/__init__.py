"""Pallas TPU kernels — the performance path.

Measured design facts on TPU v5 lite (this environment; fenced
micro-measurements, see git history ~2026-08-16 and BASELINE.md):

  * XLA lowers gather/scatter to a row-serialized loop (~11-15 ns/row for
    packed row gathers under fenced timings) — fine for the per-frame
    batched stages, far too slow inside the per-iteration solver sweep.
    (Early, broken block_until_ready timings overstated this 2-3x; a
    serial Pallas scalar gather measured SLOWER than XLA's — row gathers
    outside the sweep stay plain `x[idx]`.)
  * Mosaic scalar loops over SMEM run at ~1-2 ns per element INCLUDING
    dynamic-index VMEM row copies, with exact serial semantics (verified
    against a serial NumPy reference bit-for-bit within f32).
  * SMEM capacity is 1 MB total; 1D SMEM arrays are packed tight, 2D SMEM
    arrays pad the trailing dim (use flat 1D + manual offsets).
  * VMEM scalar extracts cost ~540 ns each — never scalar-read VMEM.

Consequences (vs. the original SURVEY.md §7 plan):

  * The flagship solver kernel is a LITERAL sequential-impulse sweep — the
    exact scalar algorithm of the reference (SURVEY.md §3.3), running at
    ~1 ns/contact-op in SMEM.  No graph coloring is needed on this path;
    iteration order matches the NumPy oracle exactly, which makes the
    1e-3 per-iteration residual parity gate (BASELINE.json:5) structural.
  * Graph coloring remains the parallelization story of the pure-XLA
    fallback backend (solver.py) used on CPU and in tests.
  * All other index-driven stages (row gathers for narrowphase/prepare,
    cache join, pair compaction) become small scalar kernels too.
"""

from phyx_tpu.kernels.contact_solver import solve_contacts_fused

__all__ = ["solve_contacts_fused"]
