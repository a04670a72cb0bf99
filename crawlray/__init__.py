"""crawlray — a Ray-Data-native crawl + data-processing engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference web crawler (Sayam241020/web-crawler, studied read-only at
/root/reference) as idiomatic ``ray.data.Dataset`` pipelines:

- sharded URL frontier with cuckoo-filter URL-seen shards held in actors
  (``crawlray.state.seen``),
- per-host politeness budgets + robots rules gating a fetcher actor pool
  (``crawlray.stages.fetch``, ``crawlray.state.politeness``),
- zero-copy Arrow ``map_batches`` stages parsing pages into tables of
  interleaved text+media documents
  (``doc_id``, ``spans: list<struct<kind,text,media_ref,offset>>``),
- outlink extraction + canonicalization + dedup and a salted
  ``groupby(host)`` shuffle rebuilding frontier partitions each round
  (``crawlray.engine``),
- round-granular checkpoint manifests with per-partition lineage + metrics
  (``crawlray.checkpoint``) so a killed job resumes byte-identically,
- plus the large-scale training-data operators (dedup family, ANN,
  text analysis, multimodal plumbing) under ``crawlray.pipelines``.

Nothing here calls ``ray.init``/``ray.shutdown`` — sessions are owned by the
caller (driver / tests / bench.py).
"""

__version__ = "0.1.0"
