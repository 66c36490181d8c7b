"""Pure batch-level functions (numpy / pyarrow only — no cv2/PIL in this sandbox).

Shared by BOTH the Ray Data stages and the single-process oracle
(`ocr_ray.pipelines.oracle`) so the two cannot diverge (SURVEY.md §7.3).
"""
