"""The fast regex scanner must agree with the stdlib-HTMLParser
reference implementation on the fixture corpus and on hostile inputs."""

from documentai_ocr_spark.extract.htmlparse import html_blocks, html_blocks_ref
from documentai_ocr_spark.synth import make_html

HOSTILE = [
    "<div><p>unclosed and <a href=x>link text here",
    "<script>if(a<b){x='</div>';}</script><p>content here after</p>",
    "<p>a &amp; b &lt;c&gt; &#65; &nbsp; end</p>",
    "<br><br/><a/><img src=x><p>text &nbsp; here</p>",
    "<!-- comment <p>not text</p> --><p>real</p>",
    "<P CLASS='x'>UPPER tags</P><LI>item</LI>",
    "<td>cell</td><td>cell2</td>",
    "<a href='x'>l1</a> mid <a>l2</a>",
    "<nav><ul><li>one</li><li>two</li></ul></nav><p>body text</p>",
    "",
    "plain, no markup at all",
    # bare '<' in prose is literal text (HTML5/HTMLParser rule) — the
    # scanner must KEEP it, not swallow-to-next-'>' as a junk tag
    "<p>a < b then more text here</p>",
    "<div>price 1 < 2 and 3 > 2</div>",
    "<p>I <3 spark</p>",
    "<p>x <b>bold</b> y < z</p>",
    "<p>5 &lt; 6 and raw < 7</p>",
    "<p>a <. b</p>",
    "<p><a href=x>link < text</a> out</p>",
    "<", "<>", "a <> b",
    # script/style are CDATA: markup-looking content inside must not
    # disturb tag state, and ONLY an exact '</ name >' ends the element
    "<script>if (a<b) {x}</script><p>kept</p>",
    "<style>a>b{color:red}</style><p>styled</p>",
    "<script>document.write('</div>')</script><p>after</p>",
    "<script>never closed <p>gone</p>",
    "<SCRIPT>UP</script ><p>case</p>",
    "<script>x</script foo></script><p>attrs</p>",
]

# degenerate: a TRUNCATED tag at EOF ('<p' with no '>'). HTMLParser
# flushes it as data on close(); the scanner's semantic (markup junk →
# dropped) is pinned here as canonical (both engine and oracle share
# the scanner, so parity is structural).
DEGENERATE = ["<p"]


def test_scanner_matches_reference_on_corpus():
    for s in range(1000):
        doc = make_html(s)
        assert html_blocks(doc) == html_blocks_ref(doc), s


def test_scanner_matches_reference_on_hostile():
    for doc in HOSTILE:
        assert html_blocks(doc) == html_blocks_ref(doc), repr(doc)


def test_degenerate_markup_drops():
    for doc in DEGENERATE:
        assert html_blocks(doc) == []


def test_link_density_accounting():
    doc = "<div>plain words <a href='#'>linky</a> tail</div>"
    [(text, links)] = html_blocks(doc)
    assert text == "plain words linky tail"
    assert links == len("linky")
