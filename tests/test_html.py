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


def test_extract_table_cells_basic_and_messy():
    from ocr_ray.functions.html import extract_table_cells

    html = ("<TABLE class='x'><tr><th>A</th><th >B</th></tr>"
            "<tr id='r'><td>1</td><td>  two\n words </td></tr></TABLE>"
            "<p>not a cell</p>"
            "<table><tr><td><b>bold</b> tail</td></tr></table>")
    cells = extract_table_cells(html)
    assert cells == [
        (0, 0, 0, "A"), (0, 0, 1, "B"),
        (0, 1, 0, "1"), (0, 1, 1, "two words"),
        (1, 0, 0, "bold tail"),
    ]


def test_extract_table_cells_empty_inputs():
    from ocr_ray.functions.html import extract_table_cells

    assert extract_table_cells("") == []
    assert extract_table_cells("<p>no tables</p>") == []
    # row with no cells contributes nothing; empty cell keeps position
    assert extract_table_cells("<table><tr></tr><tr><td></td></tr></table>") \
        == [(0, 1, 0, "")]
