"""decoder='native' through REAL Spark transport, both physical modes.

Page images are rendered numpy arrays; the preprocess + template-match
kernels run for real on executors; the OCR binding is the packaged
deterministic simulator (pdf_parser_spark.fixtures.native_sim), bound
on WORKERS via the dotted-path mechanism — module state set on the
driver does not reach forked Python workers, so this test fails if the
binding plumbing (perception.binding_specs captured into UDF closures)
breaks. Expected spans are hand-derived, not produced by the engine.
"""

import pytest

from pdf_parser_spark.fixtures import native_sim as NS
from pdf_parser_spark.plans.extract import extract_spans
from pdf_parser_spark.sources import perception as P

N_DOCS = 4


@pytest.fixture(scope="module")
def native_fixture(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("native_fix"))
    docs_path = NS.build_native_fixture(d, N_DOCS)
    return d, docs_path


@pytest.fixture()
def sim_bindings():
    P.configure_native(
        ocr="pdf_parser_spark.fixtures.native_sim:sim_ocr",
        yesno_ocr="pdf_parser_spark.fixtures.native_sim:sim_yesno",
    )
    yield
    P._binding_specs.clear()
    P.set_native_ocr(P.K.tesseract_image_to_data, P.K.tesseract_yesno)


def test_key_survives_preprocess():
    from pdf_parser_spark.sources import kernels as K

    page = NS.render_page(3, 2)
    assert NS.decode_key(page) == (3, 2)
    assert NS.decode_key(K.preprocess_page(page)) == (3, 2)  # the OCR input
    assert NS.decode_key(page[100:200, 100:300]) is None  # crops have no key


@pytest.mark.parametrize("mode", ["fused", "paged"])
def test_native_decoder_through_spark(spark, native_fixture, sim_bindings, mode):
    d, docs_path = native_fixture
    docs = spark.read.parquet(docs_path)
    out = extract_spans(docs, sections=NS.SIM_SECTIONS, decoder="native", mode=mode)
    rows = out.collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"], r["order"])
        )
    assert len(by_doc) == N_DOCS
    for idx in range(N_DOCS):
        got = sorted(by_doc[NS.doc_id_of(idx)], key=lambda t: t[3])
        exp = NS.expected_spans(idx, d)
        assert got == exp, f"native span mismatch for doc {idx} ({mode}):\n{got}\nvs\n{exp}"
