"""Reusable DataFrame→DataFrame operators.

Reference-parity operators (cleanse, SCD2, gold products) plus the
[EXT] LLM-data-pipeline tier (dedup family, similarity search, text
analysis, multimodal plumbing) mandated by BASELINE.json.

Eager materialization note (surfaced package-wide per review advice):
several multi-consumer operators — ``jaccard_pairs`` and the
chargram/prefix Jaccard family, ``_dup_gram_positions`` (ExactSubstr),
``triangle_count``, ``knn_graph``, ``tfidf_top_terms``,
``count_min_heavy_hitters``, ``pagerank`` — call ``localCheckpoint()``
on an internal aggregated relation because their consumers do not share
the exchange in one Catalyst plan (each consumer would re-evaluate the
whole upstream subtree; every such trade was A/B-measured when
introduced). Consequences callers should know:

- building the returned DataFrame runs eager Spark jobs at
  plan-construction time (the functions are not fully lazy);
- checkpoint blocks live on executor storage only — on a cluster that
  loses executors (dynamic allocation, spot nodes) a downstream action
  can fail with a lost-block error instead of recomputing; long-running
  clusters that need recompute-on-loss should persist the INPUT
  DataFrame to reliable storage first, or accept re-calling the
  operator on failure.
"""
