"""Deterministic seeded text generation for the synthetic corpus."""
from __future__ import annotations

import numpy as np

_WORDS = (
    "alloy anchor antenna apricot arc basin beacon birch bramble canyon cedar "
    "cinder cobalt comet copper coral crag creek crest delta drift dune ember "
    "fathom fern fjord flint gale garnet glacier glade granite grove gull "
    "harbor hazel heath hollow inlet iris isle jasper juniper kelp knoll lagoon "
    "larch ledge lichen linden loam lotus maple marsh meadow mesa mica mist "
    "moor moss oasis ochre onyx opal orchard osprey otter pebble pine plume "
    "prairie quarry quartz ravine reed ridge rill river rowan rune rush sage "
    "sandbar sedge shale shoal sierra slate sorrel spruce summit swale tarn "
    "thicket tide timber topaz trail tundra vale willow wren zephyr"
).split()


def make_sentence(rng: np.random.Generator) -> str:
    n = int(rng.integers(4, 11))
    words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def make_paragraph(rng: np.random.Generator, n_sentences: int | None = None) -> str:
    if n_sentences is None:
        n_sentences = int(rng.integers(1, 4))
    return " ".join(make_sentence(rng) for _ in range(n_sentences))


def make_text(rng: np.random.Generator, n_paragraphs: int = 1) -> str:
    """Paragraphs joined with "\\n\\n" — for media payloads each paragraph
    becomes one rendered band (see synth.media)."""
    return "\n\n".join(make_paragraph(rng) for _ in range(n_paragraphs))


def page_text(seed: int, page_number: int) -> str:
    """Deterministic text of PDF page ``page_number`` (1-indexed) for a
    pdf span with the given seed — shared by the generator, the Ray
    pipeline and the oracle."""
    rng = np.random.default_rng((np.uint64(seed) * np.uint64(1_000_003) + np.uint64(page_number)))
    n_paras = int(rng.integers(1, 3))
    return make_text(rng, n_paras)
