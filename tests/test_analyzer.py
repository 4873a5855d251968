"""Schema-driven analyzer construction (tokenize/analyzer.py — the
SolrSchemaUtil.readAnalyzer analog): component semantics, Porter
stemmer vocabulary, schema.xml fieldType parsing with resources, and
the end-to-end index integration (config persisted in stats.json,
reader re-registers in a fresh process)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jesterj_ray.tokenize.analyzer import (ANALYZER_CONFIGS,
                                           build_analyzer,
                                           load_schema_analyzers,
                                           parse_synonyms, porter_stem,
                                           register_analyzer, s_stem)


def test_tokenizers():
    az = lambda cfg: build_analyzer(cfg)
    assert az({"tokenizer": {"class": "standard"}})("Foo-bar_baz 12x") \
        == ["Foo", "bar", "baz", "12x"]
    assert az({"tokenizer": {"class": "whitespace"}})("a  b\tc") \
        == ["a", "b", "c"]
    assert az({"tokenizer": {"class": "letter"}})("ab12cd ef") \
        == ["ab", "cd", "ef"]
    assert az({"tokenizer": {"class": "lowercase"}})("AB cd") \
        == ["ab", "cd"]
    assert az({"tokenizer": {"class": "keyword"}})("one two") \
        == ["one two"]
    assert az({"tokenizer": {"class": "pattern",
                             "pattern": "[0-9]+", "group": 0}})(
        "a1 b22 c333") == ["1", "22", "333"]
    assert az({"tokenizer": {"class": "pattern", "pattern": ","}})(
        "a,b,,c") == ["a", "b", "c"]
    assert az({"tokenizer": {"class": "pathHierarchy"}})("/a/b/c") \
        == ["/a", "/a/b", "/a/b/c"]
    assert az({"tokenizer": {"class": "pathHierarchy"}})("a/b") \
        == ["a", "a/b"]


def test_char_filters():
    cfg = {"charFilters": [{"class": "htmlStrip"}],
           "tokenizer": {"class": "whitespace"}}
    assert build_analyzer(cfg)("<p>Hello &amp; <b>bye</b></p>") \
        == ["Hello", "&", "bye"]
    cfg = {"charFilters": [{"class": "patternReplace",
                            "pattern": "[0-9]+", "replacement": "N"}],
           "tokenizer": {"class": "whitespace"}}
    assert build_analyzer(cfg)("a1 22b") == ["aN", "Nb"]
    cfg = {"charFilters": [{"class": "mapping",
                            "mapping": {"ß": "ss", "œ": "oe"}}],
           "tokenizer": {"class": "whitespace"}}
    assert build_analyzer(cfg)("straße cœur") == ["strasse", "coeur"]


def test_basic_filters():
    base = {"tokenizer": {"class": "whitespace"}}
    az = build_analyzer(base | {"filters": [{"class": "lowercase"}]})
    assert az("AB İ") == ["ab", "i̇"]      # python full casing (repo rule)
    az = build_analyzer(base | {"filters": [
        {"class": "stop", "words": ["the", "a"], "ignoreCase": "true"}]})
    assert az("The a cat THE") == ["cat"]
    az = build_analyzer(base | {"filters": [
        {"class": "length", "min": 2, "max": 3}]})
    assert az("a bb ccc dddd") == ["bb", "ccc"]
    az = build_analyzer(base | {"filters": [
        {"class": "asciiFolding"}]})
    assert az("café naïve") == ["cafe", "naive"]
    az = build_analyzer(base | {"filters": [
        {"class": "truncate", "prefixLength": 3}]})
    assert az("abcdef ab") == ["abc", "ab"]
    az = build_analyzer(base | {"filters": [
        {"class": "removeDuplicates"}]})
    assert az("x x y x") == ["x", "y", "x"]
    az = build_analyzer(base | {"filters": [
        {"class": "englishPossessive"}]})
    assert az("dog's cats") == ["dog", "cats"]
    az = build_analyzer(base | {"filters": [
        {"class": "edgeNGram", "minGramSize": 1, "maxGramSize": 3}]})
    assert az("abcd") == ["a", "ab", "abc"]
    az = build_analyzer(base | {"filters": [
        {"class": "shingle", "outputUnigrams": "false"}]})
    assert az("a b c") == ["a b", "b c"]
    az = build_analyzer(base | {"filters": [
        {"class": "patternReplace", "pattern": "x+", "replacement": ""}]})
    assert az("axxb xx c") == ["ab", "c"]   # emptied token drops


def test_word_delimiter():
    az = build_analyzer({"tokenizer": {"class": "whitespace"},
                         "filters": [{"class":
                                      "solr.WordDelimiterGraphFilterFactory"}]})
    assert az("Wi-Fi parseHTTPResponse x86")\
        == ["Wi", "Fi", "parse", "HTTP", "Response", "x", "86"]
    az = build_analyzer({"tokenizer": {"class": "whitespace"},
                         "filters": [{"class": "wordDelimiter",
                                      "preserveOriginal": "true",
                                      "catenateWords": "true"}]})
    assert az("Wi-Fi") == ["Wi-Fi", "Wi", "Fi", "WiFi"]


def test_synonyms():
    table = parse_synonyms("tv, television\nusa => united, states\n"
                           "# comment\n")
    assert table["tv"] == ["tv", "television"]
    assert table["usa"] == ["united", "states"]
    az = build_analyzer({"tokenizer": {"class": "whitespace"},
                         "filters": [{"class": "synonymGraph",
                                      "synonyms": {"nyc":
                                                   ["new", "york"]}},
                                     {"class": "flattenGraph"}]})
    assert az("in nyc now") == ["in", "new", "york", "now"]


def test_porter_stemmer_vocabulary():
    """Known pairs from Porter's published examples."""
    pairs = {"caresses": "caress", "ponies": "poni", "ties": "ti",
             "caress": "caress", "cats": "cat", "feed": "feed",
             "agreed": "agre", "plastered": "plaster", "bled": "bled",
             "motoring": "motor", "sing": "sing",
             "conflated": "conflat", "troubled": "troubl",
             "sized": "size", "hopping": "hop", "tanned": "tan",
             "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
             "failing": "fail", "filing": "file", "happy": "happi",
             "sky": "sky", "relational": "relat",
             "conditional": "condit", "rational": "ration",
             "digitizer": "digit", "operator": "oper",
             "feudalism": "feudal", "decisiveness": "decis",
             "hopefulness": "hope", "callousness": "callous",
             "formality": "formal", "sensitivity": "sensit",
             "sensibility": "sensibl", "triplicate": "triplic",
             "formative": "form", "formalize": "formal",
             "electricity": "electr", "electrical": "electr",
             "hopeful": "hope", "goodness": "good", "revival": "reviv",
             "allowance": "allow", "inference": "infer",
             "airliner": "airlin", "adjustable": "adjust",
             "defensible": "defens", "irritant": "irrit",
             "replacement": "replac", "adjustment": "adjust",
             "dependent": "depend", "adoption": "adopt",
             "communism": "commun", "activate": "activ",
             "angularity": "angular", "homologous": "homolog",
             "effective": "effect", "bowdlerize": "bowdler",
             "probate": "probat", "rate": "rate", "cease": "ceas",
             "controll": "control", "roll": "roll"}
    for w, want in pairs.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_s_stemmer():
    assert s_stem("queries") == "query"
    assert s_stem("ponies") == "pony"
    assert s_stem("ties") == "ties"        # len 4 guard
    assert s_stem("classes") == "classe"
    assert s_stem("shoes") == "shoes"      # -oes guard
    assert s_stem("cats") == "cat"
    assert s_stem("focus") == "focus"      # -us guard
    assert s_stem("class") == "class"      # -ss guard
    assert s_stem("is") == "is"            # length guard


def test_keyword_marker_protects_stemming():
    az = build_analyzer({
        "tokenizer": {"class": "whitespace"},
        "filters": [{"class": "keywordMarker",
                     "protected": ["running"]},
                    {"class": "porterStem"}]})
    assert az("running jumping") == ["running", "jump"]


def test_unknown_components_raise():
    with pytest.raises(ValueError, match="unknown tokenizer"):
        build_analyzer({"tokenizer": {"class": "nope"}})
    with pytest.raises(ValueError, match="unknown filter"):
        build_analyzer({"filters": [{"class": "solr.NopeFilterFactory"}]})
    with pytest.raises(ValueError, match="unknown charFilter"):
        build_analyzer({"charFilters": [{"class": "zap"}]})


SCHEMA_XML = """<?xml version="1.0" ?>
<schema name="t" version="1.6">
  <fieldType name="text_en" class="solr.TextField">
    <analyzer type="index">
      <charFilter class="solr.HTMLStripCharFilterFactory"/>
      <tokenizer class="solr.StandardTokenizerFactory"/>
      <filter class="solr.StopFilterFactory" ignoreCase="true"
              words="lang/stopwords_en.txt"/>
      <filter class="solr.LowerCaseFilterFactory"/>
      <filter class="solr.EnglishPossessiveFilterFactory"/>
      <filter class="solr.KeywordMarkerFilterFactory"
              protected="protwords.txt"/>
      <filter class="solr.PorterStemFilterFactory"/>
    </analyzer>
    <analyzer type="query">
      <tokenizer class="solr.WhitespaceTokenizerFactory"/>
      <filter class="solr.SynonymGraphFilterFactory"
              synonyms="synonyms.txt" ignoreCase="true" expand="true"/>
      <filter class="solr.LowerCaseFilterFactory"/>
    </analyzer>
  </fieldType>
  <fieldType name="path" class="solr.TextField">
    <analyzer>
      <tokenizer class="solr.PathHierarchyTokenizerFactory"
                 delimiter="/"/>
    </analyzer>
  </fieldType>
</schema>"""

RESOURCES = {"lang/stopwords_en.txt": "# english stops\nthe\nan\nand\n",
             "protwords.txt": "solr\n",
             "synonyms.txt": "tv, television\n"}


def test_schema_xml_field_types():
    cfgs = load_schema_analyzers(SCHEMA_XML, RESOURCES)
    assert set(cfgs) == {"text_en", "path"}
    az = build_analyzer(cfgs["text_en"])
    # html stripped, stops out, possessive cut, solr protected, stemmed
    assert az("<b>The</b> runner's solr testing and Ponies") == \
        ["runner", "solr", "test", "poni"]
    az_p = build_analyzer(cfgs["path"])
    assert az_p("/var/log/x") == ["/var", "/var/log", "/var/log/x"]
    # query-type analyzers load separately
    qcfgs = load_schema_analyzers(SCHEMA_XML, RESOURCES,
                                  analyzer_type="query")
    azq = build_analyzer(qcfgs["text_en"])
    assert azq("TV news") == ["tv", "television", "news"]
    # missing resources fail schema load (reference behavior)
    with pytest.raises(ValueError, match="resource"):
        load_schema_analyzers(SCHEMA_XML, {})


def test_index_end_to_end_with_registered_analyzer(ray_session,
                                                   tmp_path):
    """register_analyzer -> build_index_rows -> the config persists in
    stats.json -> a reader in a 'fresh process' (registry emptied)
    re-registers from stats and tokenizes queries identically."""
    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader
    from jesterj_ray.tokenize.tokenizer import TOKENIZERS
    cfg = {"tokenizer": {"class": "standard"},
           "filters": [{"class": "lowercase"},
                       {"class": "stop", "words": ["the", "of"]},
                       {"class": "porterStem"}]}
    register_analyzer("en_stem_t1", cfg)
    docs = pd.DataFrame({
        "rid": np.arange(4, dtype=np.int64),
        "text": ["The running of the dogs", "dog runs fast",
                 "cats and ponies", "the pony runner"]})
    src = str(tmp_path / "d.parquet")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), src)
    out = str(tmp_path / "idx")
    stats = build_index_rows(src, out, text_col="text", key_col="rid",
                             tokenizer="en_stem_t1",
                             docs_per_partition=2, num_shards=2)
    assert stats["analyzer_config"] == cfg
    try:
        del TOKENIZERS["en_stem_t1"]       # simulate a fresh process
        ANALYZER_CONFIGS.pop("en_stem_t1")
        r = IndexReader(out)               # re-registers from stats
        # 'running'/'runs' stem to 'run' ('runner' stays: Porter's
        # m>1 guard on -er); query analysis shares the same chain
        docs_run, _ = r.postings("run")
        assert docs_run.size == 2          # docs 0, 1
        hits = r.topk("The Ponies", 10)
        keys = set(r.doc_keys(np.array([h[0] for h in hits],
                                       dtype=np.int64)))
        assert {int(k) for k in keys} == {2, 3}   # poni matches both
    finally:
        TOKENIZERS.pop("en_stem_t1", None)
        ANALYZER_CONFIGS.pop("en_stem_t1", None)


def test_offsets_chain():
    """build_analyzer_with_offsets: tokenizer spans survive the filter
    chain (OffsetAttribute rule); synonyms/shingles/possessive keep or
    combine source spans; outputs match build_analyzer token-for-token."""
    from jesterj_ray.tokenize.analyzer import build_analyzer_with_offsets
    cfg = {"tokenizer": {"class": "standard"},
           "filters": [{"class": "lowercase"},
                       {"class": "englishPossessive"},
                       {"class": "porterStem"}]}
    text = "The Runner's ponies"
    toks = build_analyzer_with_offsets(cfg)(text)
    assert [t["t"] for t in toks] == \
        build_analyzer(cfg)(text)
    assert toks[0] == {"t": "the", "s": 0, "e": 3, "i": 1}
    # "Runner's" spans 4..12 even after possessive-strip + stem
    assert (toks[1]["t"], toks[1]["s"], toks[1]["e"]) == ("runner", 4, 12)
    assert (toks[2]["t"], toks[2]["s"], toks[2]["e"]) == ("poni", 13, 19)
    # shingles span first..last source token
    cfg2 = {"tokenizer": {"class": "whitespace"},
            "filters": [{"class": "shingle",
                         "outputUnigrams": "false"}]}
    sh = build_analyzer_with_offsets(cfg2)("aa bb cc")
    assert [(t["t"], t["s"], t["e"]) for t in sh] == \
        [("aa bb", 0, 5), ("bb cc", 3, 8)]
    # synonym replacements inherit the source span
    cfg3 = {"tokenizer": {"class": "whitespace"},
            "filters": [{"class": "synonym",
                         "synonyms": {"nyc": ["new", "york"]}}]}
    sy = build_analyzer_with_offsets(cfg3)("in nyc")
    assert [(t["t"], t["s"], t["e"]) for t in sy] == \
        [("in", 0, 2), ("new", 3, 6), ("york", 3, 6)]


def test_pre_analyze_with_registered_analyzer():
    """pre_analyze_field consumes a registered schema-driven analyzer —
    the reference's PreAnalyzeFields-over-schema wiring."""
    import json as _json

    from jesterj_ray.tokenize.preanalyze import pre_analyze_field
    cfg = {"tokenizer": {"class": "standard"},
           "filters": [{"class": "lowercase"},
                       {"class": "stop", "words": ["the"]}]}
    register_analyzer("pa_chain_t1", cfg)
    try:
        t = pa.table({"txt": pa.array(["The Cat sat"], pa.string())})
        out = pre_analyze_field(t, field="txt", tokenizer="pa_chain_t1")
        doc = _json.loads(out["txt_preanalyzed"][0].as_py())
        assert doc["str"] == "The Cat sat"
        assert [(x["t"], x["s"], x["e"]) for x in doc["tokens"]] == \
            [("cat", 4, 7), ("sat", 8, 11)]
        with pytest.raises(ValueError, match="unknown pre-analyze"):
            pre_analyze_field(t, field="txt", tokenizer="nope_t9")
    finally:
        from jesterj_ray.tokenize.analyzer import ANALYZER_CONFIGS
        from jesterj_ray.tokenize.tokenizer import TOKENIZERS
        TOKENIZERS.pop("pa_chain_t1", None)
        ANALYZER_CONFIGS.pop("pa_chain_t1", None)


def test_pre_analyze_config_dict_in_ray_workers(ray_session):
    """The schema-analyzer pre-analyze path inside map_batches: the
    CONFIG DICT travels via fn_kwargs (workers don't share driver
    registration globals), and a charFilter chain stores the FILTERED
    text as 'str' so offsets index the stored string exactly."""
    import json as _json

    import ray.data as rd

    from jesterj_ray.tokenize.preanalyze import pre_analyze_field
    cfg = {"charFilters": [{"class": "patternReplace",
                            "pattern": "&", "replacement": "and"}],
           "tokenizer": {"class": "standard"},
           "filters": [{"class": "lowercase"}]}
    ds = rd.from_items([{"txt": "Fish & Chips"}],
                       override_num_blocks=1)
    out = ds.map_batches(pre_analyze_field, batch_format="pyarrow",
                         fn_kwargs={"field": "txt",
                                    "tokenizer": cfg}).to_pandas()
    doc = _json.loads(out["txt_preanalyzed"][0])
    assert doc["str"] == "Fish and Chips"     # post-charFilter text
    for tk in doc["tokens"]:
        assert doc["str"][tk["s"]:tk["e"]].lower() == tk["t"]
    assert [t["t"] for t in doc["tokens"]] == ["fish", "and", "chips"]


def test_dynamic_field_resolution():
    """Solr IndexSchema binding: explicit field wins, longest dynamic
    pattern next (schema order on length ties), '*' catch-all last."""
    from jesterj_ray.tokenize.analyzer import (load_schema_fields,
                                               resolve_field_type)
    xml = """<schema>
      <field name="title" type="text_en"/>
      <field name="id" type="string"/>
      <dynamicField name="*_txt" type="text_general"/>
      <dynamicField name="*_en_txt" type="text_en"/>
      <dynamicField name="attr_*" type="string"/>
      <dynamicField name="*" type="ignored"/>
    </schema>"""
    fields, dyn = load_schema_fields(xml)
    r = lambda n: resolve_field_type(n, fields, dyn)  # noqa: E731
    assert r("title") == "text_en"                # explicit wins
    assert r("body_txt") == "text_general"
    assert r("body_en_txt") == "text_en"          # longer pattern wins
    assert r("attr_color") == "string"
    assert r("whatever") == "ignored"             # catch-all
    assert resolve_field_type("x", {}, []) is None
    import pytest as _pt
    with _pt.raises(ValueError, match="start or end"):
        load_schema_fields(
            '<schema><dynamicField name="a*b" type="t"/></schema>')
