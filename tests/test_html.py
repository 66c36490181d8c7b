import numpy as np

from ocr_ray.functions.html import strip_boilerplate
from ocr_ray.synth.corpus import _make_html


def test_kill_tags_removed():
    html = (
        "<html><body><nav><a href='/'>Home</a></nav>"
        "<p>Real content paragraph with enough characters here.</p>"
        "<script>var x = trackingPixel();</script>"
        "<footer>copyright somebody</footer></body></html>"
    )
    assert strip_boilerplate(html) == "Real content paragraph with enough characters here."


def test_link_farm_dropped():
    html = (
        "<div><a href='/a'>buy cheap deals</a> <a href='/b'>more cheap deals</a>"
        " <a href='/c'>even more deals</a></div>"
        "<p>Actual article text that should clearly survive the filter.</p>"
    )
    out = strip_boilerplate(html)
    assert out == "Actual article text that should clearly survive the filter."


def test_short_labels_dropped():
    assert strip_boilerplate("<p>ok</p><p>This sentence is long enough to keep around.</p>") == (
        "This sentence is long enough to keep around."
    )


def test_multi_block_order_preserved():
    html = "<p>First block of content, long enough.</p><p>Second block of content, longer.</p>"
    assert strip_boilerplate(html).split("\n") == [
        "First block of content, long enough.",
        "Second block of content, longer.",
    ]


def test_generator_truth_matches_stripper():
    for seed in range(20):
        rng = np.random.default_rng(seed)
        html, truth = _make_html(rng)
        assert strip_boilerplate(html) == truth


def test_empty_and_tagless():
    assert strip_boilerplate("") == ""
    assert strip_boilerplate("Plain text without any markup at all here.") == (
        "Plain text without any markup at all here."
    )
