"""StaxExtracting handler factories + attribute matchers (r01 VERDICT #9;
reference ``StaxExtractingProcessor.java:263-410`` ElementSpec /
LimitedStaxHandlerFactory, pubmed-style fixture as in
``StaxExtractingProcessorTest``)."""
import pyarrow as pa
import pytest

from jesterj_ray.stages.extract import (ElementSpec, StaxHandler,
                                        extract_xml_elements)

PUBMED = """<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation Status="MEDLINE" Owner="NLM">
      <PMID Version="1">12345</PMID>
      <Article PubModel="Print">
        <ArticleTitle>Sorting large corpora</ArticleTitle>
        <Abstract>
          <AbstractText Label="BACKGROUND">Big data is big.</AbstractText>
          <AbstractText Label="METHODS">We sorted it.</AbstractText>
        </Abstract>
        <AuthorList>
          <Author ValidYN="Y"><LastName>Smith</LastName><ForeName>Ann</ForeName></Author>
          <Author ValidYN="N"><LastName>Bogus</LastName><ForeName>Bad</ForeName></Author>
          <Author ValidYN="Y"><LastName>Lee</LastName><ForeName>Bo</ForeName></Author>
        </AuthorList>
      </Article>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>"""

A_PATH = "PubmedArticleSet/PubmedArticle/MedlineCitation/Article"


def run(specs, xml=PUBMED):
    t = pa.table({"xml": pa.array([xml], pa.string())})
    return extract_xml_elements(t, xml_field="xml", specs=specs)


def test_multivalued_and_attr_text():
    """AbstractText matches twice; its Label attribute value prepends the
    captured text (inclAttributeText semantics)."""
    spec = ElementSpec("abstract").incl_attribute_text("Label")
    out = run({f"{A_PATH}/Abstract/AbstractText": [spec]})
    assert out["abstract"][0].as_py() == \
        ["BACKGROUND Big data is big.", "METHODS We sorted it."]
    assert out["xml_error"][0].as_py() is False


def test_attr_value_matcher_filters():
    """matchOnAttrValue: only Authors with ValidYN='Y' match; default
    handler collects all subtree text."""
    spec = ElementSpec("authors").match_on_attr_value("ValidYN", "Y")
    out = run({f"{A_PATH}/AuthorList/Author": [spec]})
    assert out["authors"][0].as_py() == ["SmithAnn", "LeeBo"]


def test_custom_handler_factory():
    """A custom factory gating capture to chosen child tags — the
    reference's documented 'Bob Smith from <person>' use of
    LimitedStaxHandler subclassing."""

    class NameHandler(StaxHandler):
        def __init__(self, acc, spec):
            super().__init__(acc, spec)
            self._on = False
            self._parts = []

        def on_start_element(self, tag, attrs):
            self._on = tag in ("ForeName", "LastName")

        def on_characters(self, text):
            if self._on:
                self._parts.append(text)

        def on_end_element(self, tag):
            self._on = False

        def result(self):
            # ForeName Last -> "Ann Smith" ordering via captured order
            return " ".join(reversed(self._parts))

    spec = ElementSpec("names", handler_factory=NameHandler) \
        .match_on_attr_value("ValidYN", "Y")
    out = run({f"{A_PATH}/AuthorList/Author": [spec]})
    assert out["names"][0].as_py() == ["Ann Smith", "Bo Lee"]


def test_two_specs_same_path_and_nested_paths():
    """Multiple specs per path and nested matched paths are independent."""
    s1 = ElementSpec("title")
    s2 = ElementSpec("title_copy")
    s3 = ElementSpec("pmid")
    out = run({f"{A_PATH}/ArticleTitle": [s1, s2],
               "PubmedArticleSet/PubmedArticle/MedlineCitation/PMID": [s3]})
    assert out["title"][0].as_py() == ["Sorting large corpora"]
    assert out["title_copy"][0].as_py() == ["Sorting large corpora"]
    assert out["pmid"][0].as_py() == ["12345"]


def test_long_path_flag_and_malformed():
    spec = ElementSpec("x")
    out = run({"a/b": [spec]}, xml="<a><averylongelementname><b>t</b>"
                                   "</averylongelementname></a>")
    # with a tiny buffer the deep element can't match and flags the row
    t = pa.table({"xml": pa.array(["<a><bb>hi</bb></a>"], pa.string())})
    out = extract_xml_elements(t, xml_field="xml", specs={"a/bb": [spec]},
                               path_buffer=3)
    assert out["x"][0].as_py() == []
    assert out["xml_error"][0].as_py() is True
    with pytest.raises(ValueError):
        extract_xml_elements(t, xml_field="xml", specs={"a/bb": [spec]},
                             path_buffer=3, fail_on_long_path=True)
    # malformed xml -> empty extraction + error flag
    bad = pa.table({"xml": pa.array(["<a><unclosed>"], pa.string())})
    out = extract_xml_elements(bad, xml_field="xml", specs={"a/b": [spec]})
    assert out["x"][0].as_py() == [] and out["xml_error"][0].as_py() is True
