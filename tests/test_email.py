"""Email extraction (stages/email_extract.py): the parser behaviors
the SQL oracle cannot express — multipart selection, base64 transfer
decoding, RFC 2047 encoded-word headers, missing headers."""
import base64

import pyarrow as pa

from jesterj_ray.stages.email_extract import (EmailExtractor,
                                              extract_email)


def test_multipart_prefers_text_plain():
    raw = (b"Subject: mp\r\n"
           b"Content-Type: multipart/alternative; boundary=XX\r\n\r\n"
           b"--XX\r\nContent-Type: text/html\r\n\r\n"
           b"<b>nope</b>\r\n"
           b"--XX\r\nContent-Type: text/plain\r\n\r\n"
           b"the plain body\r\n"
           b"--XX--\r\n")
    body, h = extract_email(raw)
    assert body.strip() == "the plain body"
    assert h["subject"] == "mp"


def test_base64_and_encoded_word():
    payload = base64.b64encode("héllo wörld".encode()).decode()
    raw = ("Subject: =?utf-8?b?" +
           base64.b64encode("résumé".encode()).decode() + "?=\r\n"
           "Content-Type: text/plain; charset=utf-8\r\n"
           "Content-Transfer-Encoding: base64\r\n\r\n" +
           payload + "\r\n").encode()
    body, h = extract_email(raw)
    assert body == "héllo wörld"
    assert h["subject"] == "résumé"


def test_missing_headers_null():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "raw_email": pa.array(
                      [b"Content-Type: text/plain\r\n\r\nbody only\r\n"],
                      pa.binary())})
    out = EmailExtractor()(t)
    assert out["subject"][0].as_py() is None
    assert out["from_addr"][0].as_py() is None
    assert out["body"][0].as_py().strip() == "body only"


def test_html_only_message_empty_body():
    raw = (b"Subject: h\r\nContent-Type: text/html\r\n\r\n"
           b"<p>x</p>\r\n")
    body, _ = extract_email(raw)
    # no text/plain part -> empty body by contract
    assert body == ""


def test_fetcher_robots_compliance():
    """robots.txt politeness (FetchUrl completion): injected rules,
    per-host parser cache, allow-all on unfetchable robots."""
    from jesterj_ray.stages.senders import ThrottledFetcher
    robots = {"a.example": "User-agent: *\nDisallow: /private/\n",
              "b.example": "User-agent: *\nDisallow: /\n"}
    f = ThrottledFetcher(min_interval_s=0.0, fake=True,
                         respect_robots=True, robots=robots)
    t = pa.table({"url": pa.array([
        "http://a.example/public/x",      # allowed
        "http://a.example/private/y",     # disallowed path
        "http://b.example/anything",      # fully disallowed host
        "http://c.example/no-robots",     # no rules -> fetch robots
    ], pa.string())})
    out = f(t)
    st = out["http_status"].to_pylist()
    err = out["fetch_error"].to_pylist()
    assert st[0] == 200 and err[0] == ""
    assert st[1] == -2 and err[1] == "robots_disallowed"
    assert st[2] == -2
    # c.example: fake fetch_fn returns a 200 hash blob for robots.txt
    # which parses to no rules -> allowed
    assert st[3] == 200
    # parser cached per host: exactly 3 parsers, built once
    assert set(f._robot_parsers) == {"a.example", "b.example",
                                     "c.example"}


def test_fetcher_robots_fetches_via_fetch_fn():
    from jesterj_ray.stages.senders import ThrottledFetcher
    seen = []

    def fetch(url):
        seen.append(url)
        if url.endswith("/robots.txt"):
            return 200, b"User-agent: *\nDisallow: /secret/\n"
        return 200, b"ok"

    f = ThrottledFetcher(min_interval_s=0.0, fetch_fn=fetch,
                         respect_robots=True)
    t = pa.table({"url": pa.array([
        "http://d.example/fine",
        "http://d.example/secret/file",
    ], pa.string())})
    out = f(t)
    assert out["http_status"].to_pylist() == [200, -2]
    # robots fetched exactly once for the host
    assert seen.count("http://d.example/robots.txt") == 1
