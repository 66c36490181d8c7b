import numpy as np
import pyarrow.parquet as pq

from ocr_ray.synth.corpus import DOC_SCHEMA, generate_docs, write_corpus


def test_schema_and_determinism():
    a = generate_docs(20, seed=42)
    b = generate_docs(20, seed=42)
    assert a.schema.equals(DOC_SCHEMA)
    assert a.equals(b)
    c = generate_docs(20, seed=43)
    assert not a.equals(c)


def test_offsets_shuffled_but_complete():
    docs = generate_docs(50, seed=42).to_pylist()
    shuffled = 0
    for d in docs:
        offs = [s["offset"] for s in d["spans"]]
        assert sorted(offs) == list(range(len(offs)))
        if offs != sorted(offs):
            shuffled += 1
    assert shuffled > 10  # storage order must not be offset order


def test_kind_mix():
    docs = generate_docs(300, seed=42).to_pylist()
    kinds = [s["kind"] for d in docs for s in d["spans"]]
    n = len(kinds)
    assert 0.45 < kinds.count("text") / n < 0.65
    assert 0.10 < kinds.count("html") / n < 0.30
    assert 0.05 < kinds.count("image") / n < 0.25
    assert 0.03 < kinds.count("pdf") / n < 0.20


def test_write_corpus_idempotent(tmp_path):
    out = str(tmp_path / "c")
    write_corpus(out, 10, seed=1, n_files=2)
    files = sorted(p.name for p in (tmp_path / "c").glob("*.parquet"))
    t1 = pq.read_table(str(tmp_path / "c" / files[0]))
    write_corpus(out, 10, seed=1, n_files=2)  # marker short-circuits
    t2 = pq.read_table(str(tmp_path / "c" / files[0]))
    assert t1.equals(t2)
    total = sum(pq.read_table(str(tmp_path / "c" / f)).num_rows for f in files)
    assert total == 10


def test_start_offset_continues_ids():
    a = generate_docs(5, seed=42, start=0).to_pylist()
    b = generate_docs(5, seed=42, start=5).to_pylist()
    assert a[0]["doc_id"] == "doc-00000000"
    assert b[0]["doc_id"] == "doc-00000005"
    # same doc index -> same doc regardless of which shard generated it
    c = generate_docs(10, seed=42, start=0).to_pylist()
    assert c[5]["spans"] == b[0]["spans"]


def test_lang_id_on_real_samples():
    import pandas as pd
    from ocr_ray.functions.textstats import lang_id_batch

    samples = pd.Series({
        "en": "the quick brown fox is running through a field of tall grass and it is happy",
        "es": "el perro corre por la calle y un gato lo mira desde la ventana de la casa",
        "de": "der hund läuft durch die straße und das kind ist froh ein eis zu essen",
        "fr": "le chien court dans la rue et un chat le regarde est très calme les jours",
        "zh": "今天天气很好我们一起去公园散步然后吃晚饭",
        "und": "zzz qqq xxx",
    })
    pred = lang_id_batch(samples)
    for lang, p in pred.items():
        assert p == lang, (lang, p)
