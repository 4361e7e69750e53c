"""poi_tpu — a TPU-native next-point-of-interest recommendation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the Theano
research codebase ``tangrizzly/Point-of-Interest-Recommendation`` (next-POI
recommendation over Foursquare/Gowalla check-in sequences; see SURVEY.md for
the capability map — the reference mount was empty at survey time, so the
contract is defined by BASELINE.json and SURVEY.md §2).

Layering (bottom → top):

- ``poi_tpu.parallel``  — device mesh, sharding rules, collectives, multi-host init
- ``poi_tpu.ops``       — sharded embedding lookup, sharded losses, Pallas fused
                          score+top-k kernel, blockwise/ring/Ulysses attention
- ``poi_tpu.models``    — GRU / LSTM / ST-RNN / attention sequence towers
                          (``jax.lax.scan`` cells, pure-function flax-style params)
- ``poi_tpu.data``      — check-in parsers, synthetic generator, sharded batching
- ``poi_tpu.train``     — losses, train state, pjit'd train loop
- ``poi_tpu.eval``      — Recall@k / NDCG metrics, fused full-catalog evaluation
- ``poi_tpu.utils``     — typed configs, logging, checkpointing, observability
"""

__version__ = "0.1.0"
