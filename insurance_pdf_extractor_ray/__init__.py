"""insurance_pdf_extractor_ray — a Ray-Data-native document extraction engine.

A from-scratch rebuild of the data-processing capabilities of the reference
`fran-abellan88/insurance-pdf-extractor` (a single-process FastAPI service)
as an idiomatic Ray Data batch engine:

* input: tables of interleaved text+media documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset:int32>>)``
* per-document field extraction / normalization / validation re-expressed as
  ``ray.data.Dataset.map_batches`` over zero-copy Arrow batches, with the
  stateful extractor as an actor pool,
* the multi-page reassembly as a ``groupby(doc_id)`` shuffle with a
  per-batch pre-combine (the salted/partial-aggregation path for skew),
* analytics as ``groupby().aggregate()`` pipelines,
* plus the large-scale training-data operators a 100 TB pipeline needs
  (dedup exact/MinHash-LSH/SimHash, ANN search, text analysis, multimodal
  plumbing).

No code is copied from the reference; behaviors are re-implemented from its
observable semantics (file:line citations in docstrings point at the spec).
"""

__version__ = "0.1.0"

EMPTY = "EMPTY VALUE"
