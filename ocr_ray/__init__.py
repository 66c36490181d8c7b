"""ocr_ray — a from-scratch Ray-Data-native document-extraction engine.

Re-expresses the data-processing capabilities of the reference repo
(MahmoudM69/OCR, read-only snapshot at /root/reference) as streaming
``ray.data.Dataset`` pipelines over tables of interleaved text+media
documents::

    doc_id : string
    spans  : list<struct<kind: string, text: string, media_ref: string, offset: int32>>

Media spans are routed by ``kind`` through numpy-only OCR-style
extraction (preprocess -> split -> decode -> merge), text/HTML spans
through a batched boilerplate classifier, and results are re-stitched
per ``doc_id`` in original offset order (span-sequence equality with
the pure-Python oracle in ``ocr_ray.pipelines.oracle``).

Layout:
    functions/  pure numpy/arrow batch functions (analysis, preprocess,
                split, merge, html, hashing, textstats)
    synth/      deterministic synthetic corpus + media codec (no external data)
    stages/     Ray Data stage builders (explode, extract actors, stitch)
    sources/    readers/writers (parquet stands in for Lance in this sandbox)
    pipelines/  end-to-end pipeline assembly + the pure-Python oracle
    state/      checkpoint manifest / resumable partitioned output

No module in this package calls ``ray.init()``/``ray.shutdown()`` —
sessions are owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
