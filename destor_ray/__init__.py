"""destor_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch re-expression of the capabilities of the destor dedup
platform (reference: lightfindyou/destor, read-only at /root/reference)
as idiomatic Ray Data pipelines over Arrow batches of image+caption rows.

Layout:
  codec       deterministic pure-numpy image codec (no PIL in this env)
  corpus      seeded synthetic corpus generator with a planted dup plan
  functions/  pure kernels: CDC chunkers, hashing, MinHash/SimHash, sampling
  stages/     Ray Data stages: signature, exact dedup, LSH, verify, cluster,
              rewrite scoring, restore-cost simulation, GC
  pipelines/  end-to-end pipelines (flagship dedup, text ops, ANN)
  state/      checkpoint/lineage for resumable runs
"""

__version__ = "0.1.0"
