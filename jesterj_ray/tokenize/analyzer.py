"""Schema-driven analyzer construction (r03 VERDICT depth gap #3).

The reference builds Lucene analyzers from a Solr ``schema.xml`` at
builder time (``ingest/utils/SolrSchemaUtil.java:134+`` — XPath over
``fieldType/analyzer`` nodes, charFilter/tokenizer/filter factories
resolved by class name, resources like stopword files loaded through a
ClassSubPathResourceLoader; consumed by ``PreAnalyzeFields.java:189-212``).
This module is that subsystem done natively: a declarative config —
either a dict or a ``schema.xml`` fieldType — compiles to a plain
``text -> List[str]`` callable assembled from the same three stages:

    charFilters (str -> str)  ->  tokenizer (str -> tokens)
                              ->  token filters (tokens -> tokens)

Components cover the factories the reference's own schemas use
(inventory over its test/example configsets): HTMLStrip / Mapping /
PatternReplace char filters; Standard / Whitespace / Letter / Lowercase
/ Keyword / Pattern / PathHierarchy tokenizers; LowerCase / Stop /
SynonymGraph / FlattenGraph / PorterStem / EnglishPossessive /
EnglishMinimalStem / KeywordMarker / WordDelimiterGraph / Length /
PatternReplace / ASCIIFolding / Trim / Truncate / RemoveDuplicates /
EdgeNGram / Shingle filters.  Solr factory class names
(``solr.LowerCaseFilterFactory``) and short names (``lowercase``) both
resolve.

Semantics notes (pinned in tests/test_analyzer.py):

- Tokens flow through the filter chain as (text, keyword, start, end)
  tuples — KeywordMarker sets the flag and stemmers skip flagged
  tokens (the Lucene KeywordAttribute contract); filters preserve the
  source span (the OffsetAttribute contract), which is what
  :func:`build_analyzer_with_offsets` hands to PreAnalyzeFields.
- ``standard`` approximates Lucene's UAX#29 tokenizer as maximal runs
  of unicode word characters (minus ``_``) — exact for the ASCII
  corpora here.
- ``porterStem`` is the classic Porter (1980) algorithm (public
  domain), lru-cached per unique token (vocab-bounded — the analyzer
  runs inside map_batches actors, so the cache amortizes per worker).
- ``englishMinimalStem`` is the plural-only S-stemmer (Harman 1991):
  ies->y, es->e, drop trailing s — each guarded exactly as tested.
- ``flattenGraph`` is the identity here (token lists are already
  flat); present so reference schemas load unmodified.
- Lowercasing is PYTHON ``str.lower`` full casing (repo invariant —
  Arrow utf8_lower diverges on 'İ').

Index integration: :func:`register_analyzer` installs the compiled
chain into ``TOKENIZERS`` under a name AND records the config so
``build_index_rows``/``build_index`` persist it in ``stats.json``
(``analyzer_config``); ``IndexReader`` re-registers from stats at open,
so an index built with a schema-driven analyzer opens in any process
without ambient setup.
"""

from __future__ import annotations

import functools
import re
import unicodedata
from typing import Callable, Dict, List, Optional, Tuple

Token = Tuple[str, bool, int, int]   # (text, keyword, start, end)

# ---------------------------------------------------------------- util

_SOLR_CLASS = re.compile(
    r"^(?:solr\.)?([A-Za-z0-9]+?)"
    r"(?:CharFilterFactory|TokenizerFactory|TokenFilterFactory|"
    r"FilterFactory|Factory)?$")


def _norm(name: str) -> str:
    """'solr.LowerCaseFilterFactory' / 'LowerCase' / 'lowercase' ->
    'lowercase'."""
    m = _SOLR_CLASS.match(name.strip())
    return (m.group(1) if m else name).lower()


def _bool(v, default=False) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes")


def parse_word_list(text: str) -> List[str]:
    """Solr stopwords.txt format: one entry per line, '#' comments."""
    out = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if line:
            out.append(line)
    return out


def parse_synonyms(text: str) -> Dict[str, List[str]]:
    """Solr synonyms.txt: 'a, b, c' (symmetric group) and
    'a, b => c, d' (explicit mapping) lines; '#' comments."""
    table: Dict[str, List[str]] = {}
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        if "=>" in line:
            lhs, rhs = line.split("=>", 1)
            outs = [w.strip() for w in rhs.split(",") if w.strip()]
            for w in (x.strip() for x in lhs.split(",")):
                if w:
                    table[w] = outs
        else:
            group = [w.strip() for w in line.split(",") if w.strip()]
            for w in group:
                table[w] = group
    return table


# -------------------------------------------------------- char filters

_HTML_TAG = re.compile(r"<[^>]*>")
_HTML_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">",
                  "&quot;": '"', "&apos;": "'", "&nbsp;": " "}


def _cf_htmlstrip(spec) -> Callable[[str], str]:
    def f(s: str) -> str:
        s = _HTML_TAG.sub(" ", s)
        for ent, ch in _HTML_ENTITIES.items():
            s = s.replace(ent, ch)
        return s
    return f


def _cf_patternreplace(spec) -> Callable[[str], str]:
    rx = re.compile(spec["pattern"])
    repl = spec.get("replacement", "")
    return lambda s: rx.sub(repl, s)


def _cf_mapping(spec) -> Callable[[str], str]:
    # dict config; the schema.xml 'mapping="mapping.txt"' attribute
    # resolves through resources as 'src => dst' lines
    table = dict(spec["mapping"])
    def f(s: str) -> str:
        for src, dst in table.items():
            s = s.replace(src, dst)
        return s
    return f


CHAR_FILTERS = {"htmlstrip": _cf_htmlstrip,
                "patternreplace": _cf_patternreplace,
                "mapping": _cf_mapping}


# ---- charFilter offset correction (r04 VERDICT #3) ----
#
# Lucene's charFilters remember where they edited the text so
# OffsetAttribute spans can be mapped BACK to the original field value
# (BaseCharFilter.correctOffset; the reference serializes those
# corrected offsets, PreAnalyzeFields.java:76-87).  The default chains
# here instead store the post-charFilter string (exact by
# construction); the offset-aware variants below provide the Lucene
# behavior: each filter emits an OffsetMap of its edits, maps compose
# in reverse, and token (s, e) come out indexing the ORIGINAL string.

class OffsetMap:
    """Output->input offset correction for one transform's edit list.

    Identity regions shift by the cumulative length delta; offsets
    INSIDE a replacement map position-wise into the replaced source
    span, clamped to its end (so a token starting mid-replacement
    points at real source text, and a token ending at a replacement
    boundary ends at the source boundary)."""

    def __init__(self, edits):
        """``edits`` = ascending, non-overlapping (in_start, in_end,
        out_len) triples on the INPUT string."""
        self.out_starts: List[int] = []
        self.out_ends: List[int] = []
        self.in_starts: List[int] = []
        self.in_ends: List[int] = []
        self.shifts: List[int] = []      # in = out + shift after edit i
        shift = 0
        for a, b, L in edits:
            self.out_starts.append(a - shift)
            self.out_ends.append(a - shift + L)
            self.in_starts.append(a)
            self.in_ends.append(b)
            shift += (b - a) - L
            self.shifts.append(shift)

    def correct(self, o: int) -> int:
        import bisect
        i = bisect.bisect_right(self.out_starts, o) - 1
        if i < 0:
            return o
        if o < self.out_ends[i]:
            return min(self.in_starts[i] + (o - self.out_starts[i]),
                       self.in_ends[i])
        return o + self.shifts[i]


def _apply_edits(s: str, edits) -> tuple:
    """Apply ascending (start, end, replacement) edits to ``s``;
    returns (out_string, OffsetMap)."""
    parts = []
    pos = 0
    triples = []
    for a, b, repl in edits:
        parts.append(s[pos:a])
        parts.append(repl)
        triples.append((a, b, len(repl)))
        pos = b
    parts.append(s[pos:])
    return "".join(parts), OffsetMap(triples)


def _literal_edits(s: str, src: str, dst: str):
    """Left-to-right non-overlapping occurrences — str.replace parity."""
    out = []
    i = 0
    while True:
        j = s.find(src, i)
        if j < 0:
            return out
        out.append((j, j + len(src), dst))
        i = j + len(src)


def _ocf_patternreplace(spec):
    rx = re.compile(spec["pattern"])
    repl = spec.get("replacement", "")

    def f(s: str):
        edits = [(m.start(), m.end(), m.expand(repl))
                 for m in rx.finditer(s)]
        return _apply_edits(s, edits)
    return f


def _ocf_mapping(spec):
    table = dict(spec["mapping"])

    def f(s: str):
        # sequential per-pair replace, one OffsetMap per pair — exactly
        # the plain filter's str.replace-in-table-order semantics
        maps = []
        for src, dst in table.items():
            s, m = _apply_edits(s, _literal_edits(s, src, dst))
            maps.append(m)
        return s, _ComposedMap(maps)
    return f


def _ocf_htmlstrip(spec):
    def f(s: str):
        maps = []
        s, m = _apply_edits(
            s, [(mt.start(), mt.end(), " ")
                for mt in _HTML_TAG.finditer(s)])
        maps.append(m)
        for ent, ch in _HTML_ENTITIES.items():
            s, m = _apply_edits(s, _literal_edits(s, ent, ch))
            maps.append(m)
        return s, _ComposedMap(maps)
    return f


class _ComposedMap:
    """Sequential transforms' maps composed: correct() walks them in
    reverse (last applied corrects first)."""

    def __init__(self, maps):
        self.maps = list(maps)

    def correct(self, o: int) -> int:
        for m in reversed(self.maps):
            o = m.correct(o)
        return o


OFFSET_CHAR_FILTERS = {"htmlstrip": _ocf_htmlstrip,
                       "patternreplace": _ocf_patternreplace,
                       "mapping": _ocf_mapping}

# ----------------------------------------------------------- tokenizers

# UAX#29 approximation: word-char runs, plus MidLetter apostrophes
# kept inside a token ("runner's" stays whole for EnglishPossessive)
_STANDARD_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)
_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


# tokenizers emit (text, start, end) — offsets into the string the
# tokenizer SAW (post-charFilter / post-lower for 'lowercase'); token
# filters preserve the source span (the Lucene OffsetAttribute rule),
# which is what PreAnalyzeFields serializes

_WS_RE = re.compile(r"\S+", re.UNICODE)


def _spans(rx, s):
    return [(m.group(), m.start(), m.end()) for m in rx.finditer(s)]


def _tk_standard(spec):
    return lambda s: _spans(_STANDARD_RE, s)


def _tk_whitespace(spec):
    return lambda s: _spans(_WS_RE, s)


def _tk_letter(spec):
    return lambda s: _spans(_LETTER_RE, s)


def _tk_lowercase(spec):
    return lambda s: _spans(_LETTER_RE, s.lower())


def _tk_keyword(spec):
    return lambda s: [(s, 0, len(s))] if s else []


def _tk_pattern(spec):
    rx = re.compile(spec["pattern"])
    group = int(spec.get("group", -1))
    if group >= 0:
        return lambda s: [(m.group(group), m.start(group),
                           m.end(group))
                          for m in rx.finditer(s) if m.group(group)]

    def split_mode(s):
        out, pos = [], 0
        for m in rx.finditer(s):
            if m.start() > pos:
                out.append((s[pos:m.start()], pos, m.start()))
            pos = max(pos, m.end())
        if pos < len(s):
            out.append((s[pos:], pos, len(s)))
        return [t for t in out if t[0]]
    return split_mode


def _tk_pathhierarchy(spec):
    delim = spec.get("delimiter", "/")

    def f(s: str):
        parts = [p for p in s.split(delim) if p]
        lead = s.startswith(delim)
        out, acc = [], ""
        for p in parts:
            acc = f"{acc}{delim}{p}" if (acc or lead) else p
            # end offset: prefix length (== original position unless
            # repeated delimiters collapsed — documented approximation)
            out.append((acc, 0, len(acc)))
        return out
    return f


TOKENIZER_FACTORIES = {"standard": _tk_standard,
                       "whitespace": _tk_whitespace,
                       "letter": _tk_letter,
                       "lowercase": _tk_lowercase,
                       "keyword": _tk_keyword,
                       "pattern": _tk_pattern,
                       "pathhierarchy": _tk_pathhierarchy}

# -------------------------------------------------------- porter stemmer

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in c*(VC)^m v*."""
    m, prev_v = 0, False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    return (len(w) >= 3 and _is_cons(w, len(w) - 3)
            and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)
            and w[-1] not in "wxy")


@functools.lru_cache(maxsize=65536)
def porter_stem(w: str) -> str:
    """Classic Porter (1980) — the PorterStemFilter algorithm."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"),
                     ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
                     ("abli", "able"), ("alli", "al"), ("entli", "ent"),
                     ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
                     ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
                     ("iveness", "ive"), ("fulness", "ful"),
                     ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break
    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if w.endswith(suf):
            if _measure(w[:-len(suf)]) > 0:
                w = w[:-len(suf)] + rep
            break
    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
                "ous", "ive", "ize"):
        if w.endswith(suf):
            stem = w[:-len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def s_stem(w: str) -> str:
    """Harman (1991) S-stemmer — EnglishMinimalStem's plural-only cut."""
    if len(w) < 3 or not w.endswith("s"):
        return w
    if w.endswith("ies"):
        return w[:-3] + "y" if len(w) > 4 and w[-4] not in "ae" else w
    if w.endswith("es"):
        return w[:-1] if w[-3] not in "aeo" else w
    return w[:-1] if w[-2] not in "us" else w


# ------------------------------------------------------- token filters
# each factory: spec -> (List[Token] -> List[Token])

def _tf_lowercase(spec):
    return lambda ts: [(t.lower(), kw, s, e) for t, kw, s, e in ts]


def _tf_stop(spec):
    words = spec.get("words", [])
    if isinstance(words, str):
        words = parse_word_list(words)
    # Lucene/Solr StopFilterFactory defaults ignoreCase=false — match
    # it so a reference schema.xml loaded unmodified filters the same
    # token set (StopFilterFactory.java; pinned in test_analyzer)
    ic = _bool(spec.get("ignoreCase"), False)
    stop = {w.lower() for w in words} if ic else set(words)
    if ic:
        return lambda ts: [tk for tk in ts
                           if tk[0].lower() not in stop]
    return lambda ts: [tk for tk in ts if tk[0] not in stop]


def _tf_synonym(spec):
    syn = spec.get("synonyms", {})
    if isinstance(syn, str):
        syn = parse_synonyms(syn)
    expand = _bool(spec.get("expand"), True)
    ic = _bool(spec.get("ignoreCase"), False)
    table = {(k.lower() if ic else k): v for k, v in syn.items()}
    def f(ts: List[Token]) -> List[Token]:
        out = []
        for t, kw, s, e in ts:
            key = t.lower() if ic else t
            if key in table:
                reps = table[key] if expand else table[key][:1]
                # replacements inherit the source span (OffsetAttribute)
                out.extend((r, kw, s, e) for r in reps)
            else:
                out.append((t, kw, s, e))
        return out
    return f


def _tf_flattengraph(spec):
    return lambda ts: ts        # token lists are already flat


def _tf_porterstem(spec):
    return lambda ts: [(t if kw else porter_stem(t), kw, s, e)
                       for t, kw, s, e in ts]


def _tf_englishminimalstem(spec):
    return lambda ts: [(t if kw else s_stem(t), kw, s, e)
                       for t, kw, s, e in ts]


def _tf_englishpossessive(spec):
    def strip1(t: str) -> str:
        return t[:-2] if len(t) > 2 and t.endswith(("'s", "’s")) \
            else t
    return lambda ts: [(strip1(t), kw, s, e) for t, kw, s, e in ts]


def _tf_keywordmarker(spec):
    prot = spec.get("protected", [])
    if isinstance(prot, str):
        prot = parse_word_list(prot)
    ic = _bool(spec.get("ignoreCase"), False)
    pset = {w.lower() for w in prot} if ic else set(prot)
    def f(ts):
        return [(t, kw or (t.lower() if ic else t) in pset, s, e)
                for t, kw, s, e in ts]
    return f


_WD_SPLIT = re.compile(
    r"[^0-9A-Za-z]+|(?<=[a-z])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])"
    r"|(?<=[0-9])(?=[A-Za-z])|(?<=[A-Za-z])(?=[0-9])")


def _tf_worddelimiter(spec):
    preserve = _bool(spec.get("preserveOriginal"), False)
    catenate = _bool(spec.get("catenateWords"), False)
    def f(ts: List[Token]) -> List[Token]:
        out = []
        for t, kw, s, e in ts:
            parts = [p for p in _WD_SPLIT.split(t) if p]
            if preserve and parts != [t]:
                out.append((t, kw, s, e))
            # sub-tokens keep the identifier-wide span (matches the
            # repo's preanalyze.analyze_with_offsets convention)
            out.extend((p, kw, s, e) for p in parts)
            if catenate and len(parts) > 1:
                out.append(("".join(parts), kw, s, e))
        return out
    return f


def _tf_length(spec):
    lo = int(spec.get("min", 0))
    hi = int(spec.get("max", 1 << 30))
    return lambda ts: [tk for tk in ts if lo <= len(tk[0]) <= hi]


def _tf_patternreplace(spec):
    rx = re.compile(spec["pattern"])
    repl = spec.get("replacement", "")
    return lambda ts: [(rx.sub(repl, t), kw, s, e)
                       for t, kw, s, e in ts]


def _tf_asciifolding(spec):
    def fold(t: str) -> str:
        return "".join(c for c in unicodedata.normalize("NFKD", t)
                       if not unicodedata.combining(c))
    return lambda ts: [(fold(t), kw, s, e) for t, kw, s, e in ts]


def _tf_trim(spec):
    return lambda ts: [(t.strip(), kw, s, e) for t, kw, s, e in ts]


def _tf_truncate(spec):
    n = int(spec.get("prefixLength", 5))
    return lambda ts: [(t[:n], kw, s, e) for t, kw, s, e in ts]


def _tf_removeduplicates(spec):
    def f(ts: List[Token]) -> List[Token]:
        out: List[Token] = []
        for tk in ts:
            if not out or out[-1][0] != tk[0]:
                out.append(tk)
        return out
    return f


def _tf_edgengram(spec):
    lo = int(spec.get("minGramSize", 1))
    hi = int(spec.get("maxGramSize", 2))
    def f(ts: List[Token]) -> List[Token]:
        out = []
        for t, kw, s, e in ts:
            for n in range(lo, min(hi, len(t)) + 1):
                out.append((t[:n], kw, s, e))
        return out
    return f


def _tf_shingle(spec):
    lo = int(spec.get("minShingleSize", 2))
    hi = int(spec.get("maxShingleSize", 2))
    sep = spec.get("tokenSeparator", " ")
    unigrams = _bool(spec.get("outputUnigrams"), True)
    def f(ts: List[Token]) -> List[Token]:
        words = [tk[0] for tk in ts]
        out: List[Token] = []
        for i in range(len(words)):
            if unigrams:
                out.append(ts[i])
            for n in range(lo, hi + 1):
                if i + n <= len(words):
                    # shingle spans first token start .. last token end
                    out.append((sep.join(words[i:i + n]), False,
                                ts[i][2], ts[i + n - 1][3]))
        return out
    return f


def _tf_drop_empty(spec):
    return lambda ts: [tk for tk in ts if tk[0]]


TOKEN_FILTERS = {"lowercase": _tf_lowercase,
                 "stop": _tf_stop,
                 "synonym": _tf_synonym,
                 "synonymgraph": _tf_synonym,
                 "flattengraph": _tf_flattengraph,
                 "porterstem": _tf_porterstem,
                 "englishminimalstem": _tf_englishminimalstem,
                 "englishpossessive": _tf_englishpossessive,
                 "keywordmarker": _tf_keywordmarker,
                 "worddelimiter": _tf_worddelimiter,
                 "worddelimitergraph": _tf_worddelimiter,
                 "length": _tf_length,
                 "patternreplace": _tf_patternreplace,
                 "asciifolding": _tf_asciifolding,
                 "trim": _tf_trim,
                 "truncate": _tf_truncate,
                 "removeduplicates": _tf_removeduplicates,
                 "removeduplicatestoken": _tf_removeduplicates,
                 "edgengram": _tf_edgengram,
                 "shingle": _tf_shingle}

# ------------------------------------------------------------ assembly


def _compile(config: dict):
    """Shared chain compiler: (charFilters, tokenizer, tokenFilters).
    Unknown component classes raise (the reference fails schema load
    the same way)."""
    cfs = []
    for spec in config.get("charFilters", []):
        name = _norm(spec["class"])
        if name not in CHAR_FILTERS:
            raise ValueError(f"unknown charFilter {spec['class']!r}")
        cfs.append(CHAR_FILTERS[name](spec))
    tok_spec = config.get("tokenizer") or {"class": "standard"}
    tname = _norm(tok_spec["class"])
    if tname not in TOKENIZER_FACTORIES:
        raise ValueError(f"unknown tokenizer {tok_spec['class']!r}")
    tokenize = TOKENIZER_FACTORIES[tname](tok_spec)
    tfs = []
    for spec in config.get("filters", []):
        name = _norm(spec["class"])
        if name not in TOKEN_FILTERS:
            raise ValueError(f"unknown filter {spec['class']!r}")
        tfs.append(TOKEN_FILTERS[name](spec))
    tfs.append(_tf_drop_empty({}))   # stemming/replace can empty a token
    return cfs, tokenize, tfs


def _run_chain(cfs, tokenize, tfs, text: str) -> List[Token]:
    s = text
    for cf in cfs:
        s = cf(s)
    ts: List[Token] = [(t, False, a, b) for t, a, b in tokenize(s)]
    for tf in tfs:
        ts = tf(ts)
    return ts


def build_analyzer(config: dict) -> Callable[[str], List[str]]:
    """Compile a declarative analyzer config into ``text -> tokens``.

    Config shape (the dict analog of a schema.xml fieldType analyzer):
    ``{"charFilters": [{"class": ...}, ...], "tokenizer": {"class":
    ...}, "filters": [{"class": ...}, ...]}``."""
    cfs, tokenize, tfs = _compile(config)

    def analyze(text: str) -> List[str]:
        return [tk[0] for tk in _run_chain(cfs, tokenize, tfs, text)]

    return analyze


def build_analyzer_with_offsets(config: dict
                                ) -> Callable[[str], List[dict]]:
    """Like :func:`build_analyzer` but emitting the pre-analyzed token
    dicts ``{"t", "s", "e", "i"}`` the PreAnalyzeFields JSON format
    wants (``tokenize/preanalyze.py``) — filters preserve each token's
    source span (Lucene OffsetAttribute rule; derived tokens like
    synonyms/word-delimiter parts inherit it, shingles span first to
    last).  Offsets index the string the TOKENIZER saw: after char
    filters, and after ``.lower()`` for the 'lowercase' tokenizer."""
    cfs, tokenize, tfs = _compile(config)

    def analyze(text: str) -> List[dict]:
        return [{"t": t, "s": a, "e": b, "i": 1}
                for t, _, a, b in _run_chain(cfs, tokenize, tfs, text)]

    return analyze


def _compile_offset_cfs(config: dict):
    """The offset-aware charFilter chain for ``correct_offsets`` modes
    (every built-in charFilter has an offset-aware variant; a custom
    one without it fails loudly rather than emitting wrong offsets)."""
    ocfs = []
    for spec in config.get("charFilters", []):
        name = _norm(spec["class"])
        if name not in OFFSET_CHAR_FILTERS:
            raise ValueError(
                f"charFilter {spec['class']!r} has no offset-aware "
                "variant — corrected offsets unavailable for this chain")
        ocfs.append(OFFSET_CHAR_FILTERS[name](spec))
    return ocfs


def build_analyzer_with_corrected_offsets(config: dict
                                          ) -> Callable[[str], List[dict]]:
    """Lucene ``correctOffset`` parity (r04 VERDICT #3): like
    :func:`build_analyzer_with_offsets`, but every token's (s, e)
    indexes the ORIGINAL field value — charFilter edits are mapped
    back through each filter's :class:`OffsetMap`, exactly what the
    reference serializes (``PreAnalyzeFields.java:76-87``, Lucene
    ``OffsetAttribute`` after ``BaseCharFilter.correctOffset``)."""
    ocfs = _compile_offset_cfs(config)
    cfs, tokenize, tfs = _compile(config)
    del cfs  # the offset-aware chain replaces the plain one

    def analyze(text: str) -> List[dict]:
        s = text
        maps = []
        for ocf in ocfs:
            s, m = ocf(s)
            maps.append(m)
        comp = _ComposedMap(maps)
        ts: List[Token] = [(t, False, a, b) for t, a, b in tokenize(s)]
        for tf in tfs:
            ts = tf(ts)
        return [{"t": t, "s": comp.correct(a), "e": comp.correct(b),
                 "i": 1} for t, _, a, b in ts]

    return analyze


def build_preanalyzer(config: dict, correct_offsets: bool = False):
    """PreAnalyzeFields variant: ``text -> (analyzed_text, tokens)``
    where ``analyzed_text`` is the POST-charFilter string the offsets
    index — the pre-analyzed JSON stores THAT string so ``str[s:e]``
    always lands on the token (Lucene maps offsets back to source via
    correctOffset(); storing the filtered text is the exact-by-
    construction alternative here).

    ``correct_offsets=True`` is the Lucene-parity mode (r04 VERDICT
    #3): ``analyzed_text`` is the ORIGINAL text and every (s, e) is
    corrected back through the charFilter OffsetMaps — what the
    reference's serialized token stream holds."""
    cfs, tokenize, tfs = _compile(config)
    if correct_offsets:
        corrected = build_analyzer_with_corrected_offsets(config)
        return lambda text: (text, corrected(text))

    def analyze(text: str):
        s = text
        for cf in cfs:
            s = cf(s)
        ts: List[Token] = [(t, False, a, b) for t, a, b in tokenize(s)]
        for tf in tfs:
            ts = tf(ts)
        return s, [{"t": t, "s": a, "e": b, "i": 1}
                   for t, _, a, b in ts]

    return analyze


# ------------------------------------------------------ schema.xml load


def load_schema_analyzers(xml_text: str,
                          resources: Optional[Dict[str, str]] = None,
                          analyzer_type: str = "index"
                          ) -> Dict[str, dict]:
    """Parse ``schema.xml`` fieldTypes into analyzer configs —
    the SolrSchemaUtil.getFieldType / readAnalyzer analog.

    ``resources`` maps file attributes (``words="stopwords.txt"``,
    ``synonyms=...``, ``protected=...``, ``mapping=...``) to their
    content, the ClassSubPathResourceLoader stand-in.  Returns
    {fieldType name: config dict} for every fieldType with an analyzer
    matching ``analyzer_type`` ('index' also accepts untyped analyzers,
    Solr's rule)."""
    import xml.etree.ElementTree as ET
    res = resources or {}

    def resource(fname: str) -> str:
        if fname not in res:
            raise ValueError(f"analyzer resource {fname!r} not provided")
        return res[fname]

    def component(el) -> dict:
        spec = dict(el.attrib)
        if "words" in spec:
            spec["words"] = parse_word_list(resource(spec["words"]))
        if "protected" in spec:
            spec["protected"] = parse_word_list(
                resource(spec["protected"]))
        if "synonyms" in spec:
            spec["synonyms"] = parse_synonyms(resource(spec["synonyms"]))
        if "mapping" in spec:
            pairs = {}
            for line in resource(spec["mapping"]).splitlines():
                line = line.split("#", 1)[0].strip()
                if "=>" in line:
                    src, dst = line.split("=>", 1)
                    pairs[src.strip().strip('"')] = \
                        dst.strip().strip('"')
            spec["mapping"] = pairs
        return spec

    root = ET.fromstring(xml_text)
    out: Dict[str, dict] = {}
    for ft in root.iter("fieldType"):
        name = ft.get("name")
        chosen = None
        for an in ft.findall("analyzer"):
            at = an.get("type")
            if at == analyzer_type or (analyzer_type == "index"
                                       and at is None):
                chosen = an
                if at == analyzer_type:
                    break
        if chosen is None or name is None:
            continue
        cfg = {"charFilters": [component(e)
                               for e in chosen.findall("charFilter")],
               "filters": [component(e)
                           for e in chosen.findall("filter")]}
        tk = chosen.find("tokenizer")
        if tk is not None:
            cfg["tokenizer"] = component(tk)
        out[name] = cfg
    return out


def load_schema_fields(xml_text: str):
    """Parse ``<field>`` and ``<dynamicField>`` declarations — the
    IndexSchema field-to-fieldType binding the reference's schemas
    rely on.  Returns (fields, dynamics): explicit
    {field name: fieldType} plus [(pattern, fieldType)] where a
    pattern is ``*suffix``, ``prefix*`` or the ``*`` catch-all."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml_text)
    fields: Dict[str, str] = {}
    dynamics: List[tuple] = []
    for el in root.iter("field"):
        n, t = el.get("name"), el.get("type")
        if n and t:
            fields[n] = t
    for el in root.iter("dynamicField"):
        n, t = el.get("name"), el.get("type")
        if n and t:
            if not (n == "*" or n.startswith("*") or n.endswith("*")):
                raise ValueError(
                    f"dynamicField pattern {n!r}: '*' only at start "
                    "or end (Solr rule)")
            dynamics.append((n, t))
    return fields, dynamics


def resolve_field_type(field_name: str, fields: Dict[str, str],
                       dynamics: List[tuple]) -> Optional[str]:
    """Solr IndexSchema resolution: an explicit ``<field>`` wins;
    otherwise the LONGEST matching dynamicField pattern (Solr sorts
    dynamic fields by pattern length descending; schema order breaks
    length ties); ``*`` matches last; None when nothing matches."""
    t = fields.get(field_name)
    if t is not None:
        return t
    best = None
    best_len = -1
    for pat, typ in dynamics:
        if pat == "*":
            matched = True
            plen = 0
        elif pat.startswith("*"):
            matched = field_name.endswith(pat[1:])
            plen = len(pat)
        else:
            matched = field_name.startswith(pat[:-1])
            plen = len(pat)
        if matched and plen > best_len:
            best, best_len = typ, plen
    return best


# --------------------------------------------------- registry plumbing

ANALYZER_CONFIGS: Dict[str, dict] = {}


def register_analyzer(name: str, config: dict) -> Callable[[str],
                                                           List[str]]:
    """Compile ``config`` and install it into the engine's TOKENIZERS
    registry under ``name`` — indexes built with it persist the config
    in stats.json (``analyzer_config``) so readers in other processes
    re-register automatically."""
    from .tokenizer import TOKENIZERS
    fn = build_analyzer(config)
    TOKENIZERS[name] = fn
    ANALYZER_CONFIGS[name] = config
    return fn


def ensure_registered(name: str, config: Optional[dict]) -> None:
    """Reader-side: make TOKENIZERS[name] resolvable from a persisted
    config.  No-op when the SAME config is already registered; a
    different config under the same name raises — two indexes silently
    sharing one chain would tokenize one of them wrongly (empty
    results, never an error) which is exactly the misbuild class the
    BM25F doc-space guard exists to prevent."""
    from .tokenizer import TOKENIZERS
    if config is None:
        return
    if name in ANALYZER_CONFIGS:
        if ANALYZER_CONFIGS[name] != config:
            raise ValueError(
                f"analyzer name {name!r} already registered in this "
                "process with a DIFFERENT config — rename one fieldType "
                "(configs must be identical to share a name)")
        return
    if name in TOKENIZERS:
        # a frozen built-in (simple/code) name collides with a
        # schema-driven config: never silently shadow either way
        raise ValueError(
            f"analyzer name {name!r} collides with a built-in "
            "tokenizer; choose another fieldType/registration name")
    register_analyzer(name, config)


# ------------------------------------------------- actor-pool stage

# FROZEN config for the SQL-oracled analyzed_token_counts query: every
# component is exactly mirrored in DuckDB (pattern tokenize ->
# lower() -> NOT IN -> length BETWEEN -> the S-stemmer CASE).  Edit
# both sides together or the driver hash breaks.
ENGLISH_COUNTS_CONFIG = {
    "tokenizer": {"class": "pattern", "pattern": "[A-Za-z0-9]+",
                  "group": 0},
    "filters": [{"class": "lowercase"},
                {"class": "stop",
                 "words": ["the", "and", "for", "with", "that",
                           "this"]},
                {"class": "length", "min": 3, "max": 20},
                {"class": "englishMinimalStem"}],
}


class AnalyzedTokenStats:
    """Actor-pool stage: per-doc token counts through a compiled
    analyzer chain — the chain compiles ONCE per actor in ``__init__``
    (the reference builds its Lucene analyzer once per step via a
    ThreadLocal factory, ``PreAnalyzeFields.java:189-212``).  Docs
    whose chain output is empty are dropped (mirrors the SQL oracle's
    GROUP BY semantics)."""

    def __init__(self, config: dict, field: str = "text",
                 id_col: str = "doc_id"):
        self.analyze = build_analyzer(config)
        self.field = field
        self.id_col = id_col

    def __call__(self, batch):
        import pyarrow as pa
        ids, n_tok, n_dist = [], [], []
        for did, v in zip(batch[self.id_col].to_pylist(),
                          batch[self.field].to_pylist()):
            ts = self.analyze(v or "")
            if not ts:
                continue
            ids.append(did)
            n_tok.append(len(ts))
            n_dist.append(len(set(ts)))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_tokens": pa.array(n_tok, pa.int64()),
                         "n_distinct": pa.array(n_dist, pa.int64())})
