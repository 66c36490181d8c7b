"""Deterministic synthetic corpus + media codec (seeded; no external data).

The sandbox has no real scans, PDFs, or OCR models, so media payloads
are synthesized: ``media_ref`` URIs fully determine a degraded page
image (skew / inversion / salt&pepper noise) whose content is a
bit-matrix rendering of known text. "OCR" is then a *real* image
pipeline — the text is only recoverable after the same preprocessing
chain the reference applies (invert, denoise, deskew, binarize), which
makes span-sequence correctness an end-to-end test of the math instead
of a string pass-through. (The reference itself ships a mock model
placeholder: /root/reference/data/models/mock/.)
"""
