"""Device-mesh distribution: sharded pipeline stages + distributed BA.

The reference is a single Python process (SURVEY.md §2.4) — its implicit
data-parallel axes (camera loops, point loops, BA residual loops) become
explicit mesh axes here: views shard over ``cam``, BA residual blocks over
``point``, long recorded sequences over ``time``.  Collectives are XLA
``psum``/``all_gather``/``ppermute`` over ICI — the NCCL-equivalent layer.
"""
