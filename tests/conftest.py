import pyarrow as pa
import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_600(tmp_path_factory):
    """Small deterministic corpus (600 docs = 50 per fixture family) on disk."""
    from insurance_pdf_extractor_ray.sources import synth

    d = tmp_path_factory.mktemp("corpus600")
    docs = synth.docs_table(range(600))
    fields, spans = synth.expected_tables(range(600))
    import pyarrow.parquet as pq

    pq.write_table(docs, d / "documents.parquet")
    pq.write_table(fields, d / "expected_fields.parquet")
    pq.write_table(spans, d / "expected_spans.parquet")
    return d


def to_arrow(result) -> pa.Table:
    """Normalize a Dataset / DataFrame / Table result to pa.Table (small results only)."""
    import pandas as pd
    import ray
    import ray.data

    if isinstance(result, ray.data.Dataset):
        tables = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
        return pa.concat_tables(tables) if tables else None
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result)
    return result
