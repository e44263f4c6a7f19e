"""katydid_haskell_ray — a from-scratch Ray-Data-native validation + data
processing engine with the query semantics of katydid/katydid-haskell.

The reference (katydid-haskell, /root/reference) validates ordered labeled
trees against Relapse grammars, one tree at a time, sequentially.  This
package re-expresses those semantics for columnar tables on Ray Data:

- ``exprs``     — the Relapse scalar expression stdlib (eq/ne/lt/.../regex/
                  length/type, katydid error-as-value semantics) with BOTH a
                  scalar (oracle) evaluator and a vectorized pyarrow/numpy
                  evaluator with predicate CSE.
- ``patterns``  — the smart-constructor pattern algebra (Empty/ZAny/Node/Or/
                  And/Not/Concat/Interleave/ZeroOrMore/Optional/Contains/Ref)
                  with hash-consing and normalization.
- ``derive``    — Brzozowski tree-derivative evaluation (calls/returns with
                  if-expr compilation, zipper state compression and per-actor
                  memo caches).
- ``spec``      — JSON constraint-spec DSL -> compiled grammar; a column-plan
                  compiler that lowers supported grammars to vectorized
                  per-batch Arrow kernels.
- ``stages``    — Ray Data map_batches stages (constraint eval, image decode
                  validation, stats/sketch accumulation, dedup, similarity).
- ``pipelines`` — end-to-end validation + query pipelines.
- ``sources``   — deterministic synthetic image+caption table (input_hint
                  shape) and reader helpers.
- ``state``     — mergeable sketches (HLL, KLL, Bloom, MinHash, SimHash) and
                  the per-partition lineage/metrics manifest.

No code is copied from the reference; citations in docstrings are
``file:line`` pointers into /root/reference for semantic parity checking.
"""

__version__ = "0.1.0"
