"""Content-robustness fuzzer: hostile variants of the driver fixtures.

The driver regenerates the parquet fixtures between rounds and has
already changed encodings twice (tables.py header). This tool is the
defense-in-depth for the CONTENT axis: it derives a deterministic
hostile variant of a fixture directory — NULL dimension keys, unicode
and non-ASCII whitespace text, empty/1-token documents, epoch-0 and
pre-1970 timestamps, malformed/NULL JSON props, zero-norm and duplicate
embeddings, degenerate min==max value ranges — and the differential
harness (tools/check_oracle.py) then runs Spark AND DuckDB over the
SAME hostile files, so any divergence is an engine-semantics bug, not a
fixture artifact.

Usage:
  python tools/hostile_fixtures.py [src_sf_dir] [dest_dir]
  python tools/check_oracle.py <dest_dir>

Everything is seeded/deterministic: same input -> same hostile bytes.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

#: non-ASCII whitespace + multibyte content mixed into document text
_UNICODE_SNIPPETS = (
    "café naïve — em–dash",
    "日本語のテキスト mixed with ascii",
    "emoji \U0001f600 \U0001f680 payload",
    "nbsp separated tokens",
    "line separator and para separator",
    "zero​width​joined",
)


def _mutate_documents(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["doc_id"])
    for i in range(n):
        k = i % 31
        if k == 0:
            d["lang"][i] = None
        elif k == 1:
            d["source"][i] = None
        elif k == 2:
            d["text"][i] = ""  # empty document
        elif k == 3:
            d["text"][i] = "solo"  # 1-token doc (bigram/shingle edge)
        elif k == 4:
            d["text"][i] = _UNICODE_SNIPPETS[i % len(_UNICODE_SNIPPETS)]
        elif k == 5:
            d["text"][i] = "x" * 300  # one giant token
        elif k == 6:
            d["text"][i] = "  leading and   multiple   spaces  "
        elif k == 7 and i + 1 < n:
            d["text"][i] = d["text"][i + 1]  # exact duplicate pair
        elif k == 8:
            d["lang"][i] = ""  # empty string is NOT NULL (distinct group)
        elif k == 9:
            d["text"][i] = "   "  # whitespace-only document
        # fuzz round 4 classes
        elif k == 10:
            # control ws incl. \x0B (vertical tab) + \x0C (form feed):
            # Java \s has \x0B, RE2 \s does not — the normalizer pins an
            # explicit class so both engines collapse it (ADVICE r9)
            d["text"][i] = "line1\nline2\ttabbed\rcarriage\x0bvtab\x0cff"
        elif k == 11:
            d["text"][i] = "!!! ??? ... ;;; ---"  # punctuation-only
        elif k == 12:
            # hash-separator + JSON/XML metacharacters inside content
            d["text"][i] = "unit\x1fsep \"quote\" <tag> \\backslash 'apos'"
        # fuzz round 6 classes
        elif k == 13:
            d["text"][i] = None  # NULL document body (failed fetch row)
        elif k == 14:
            d["doc_id"][i] = -abs(d["doc_id"][i]) - 1  # negative id:
            # Python %/floor-mod vs SQL trunc-mod in closed-form oracles
        elif k == 15:
            # 2.1k chars of one repeated bigram. First run used 21k:
            # no divergence, but the ~30 IDENTICAL long docs collide
            # into the same MinHash bands and the exact-Jaccard verify
            # of the quadratic candidate set took 773 s at sf0.001 —
            # the production answer to identical-doc clusters is the
            # exact-hash dedup stage FIRST (dedup_exact), not bigger
            # near-dup verifies.
            d["text"][i] = "ab " * 700
        elif k == 16:
            d["text"][i] = "pre\x00post nul byte"  # NUL inside UTF-8
        # fuzz round 7 classes
        elif k == 17:
            # Unicode normalization: NFC vs NFD spellings of the same
            # word (distinct code-point sequences that RENDER identically)
            # plus astral-plane chars (UTF-16 surrogate pairs in JVM land:
            # Java String.length() counts UTF-16 units, so any kernel
            # leaking through a char-unit length diverges from DuckDB's
            # code-point count)
            d["text"][i] = (
                "caf\u00e9 nfc cafe\u0301 nfd "
                "\U0001d518\U0001d52b\U0001d526 astral \U0001f9ea"
            )
        elif k == 18:
            # leading combining marks: a "word" that begins with
            # zero-width combining code points (regex \w / split edges)
            d["text"][i] = "́̈combined start é̂ stack"

        # fuzz round 8 classes
        elif k == 19:
            d["text"][i] = "\n\n\n"  # newline-only body: every line is
            # empty - line-ratio denominators, sentence splitter edges
        elif k == 20:
            # CSV/JSON metacharacter gauntlet: quote + delimiter + CRLF
            # inside one field - probes writer quoting/escaping parity
            # in the roundtrip queries
            d["text"][i] = 'a,b"c\r\nnext,"quoted,cell"'
        elif k == 21:
            # one 4-gram repeated back-to-back: self-overlapping
            # duplicate spans / repetition kernels (the same shingle
            # recurs at every period)
            d["text"][i] = "alpha beta gamma delta " * 12
        elif k == 22:
            d["doc_id"][i] = 2**62 + i  # extreme POSITIVE id (negative
            # is k==14): closed-form media generators multiply by 31

        # fuzz round 9 classes
        elif k == 23:
            # case-folding gauntlet: Turkish dotted/dotless I, German
            # sharp s, Greek capital/final sigma — lower()/upper() are
            # locale/tailoring-sensitive (JVM vs DuckDB's utf8proc), so
            # any case-normalizing kernel is a divergence candidate
            d["text"][i] = "İstanbul Iık STRASSE straße ΣΙΣΥΦΟΣ σισυφος"
        elif k == 24:
            # full-width digits/letters + BOM + RTL override: regex
            # classes (\d, \w) and trim/strip behavior on format chars
            d["text"][i] = "﻿１２３ ＡＢＣ ‮reversed‬ end"
        elif k == 25 and i + 1 < n:
            # DUPLICATE doc_id with DIFFERENT text (PK collision where
            # the payload differs): dedup keep-rules and any join on
            # doc_id now fan out — tiebreaks must be total on content
            d["doc_id"][i] = d["doc_id"][i + 1]
        elif k == 26:
            d["lang"][i] = "EN"  # case-variant of the dominant 'en'
            # group: case-sensitive grouping keeps it distinct; any
            # kernel lowercasing lang on ONE engine only diverges
        # fuzz round 11 classes
        elif k == 27:
            d["text"][i] = "﻿"  # BOM-only body (1 code point,
            # 3 UTF-8 bytes: char-vs-byte length and trim edges)
        elif k == 28:
            d["text"][i] = "x" * 120  # EXACTLY one tile (chunk=120)
            # boundary: ceil(120/120)=1 vs the >CHUNK split predicate

        # fuzz round 16 classes
        elif k == 29:
            # blocklist phrase split by \x0B / \x0C INSIDE the phrase:
            # before the explicit-whitespace-class pin (ADVICE r9) Java's
            # \s collapsed the VT so Spark matched "slow query" while
            # DuckDB's RE2 left "slow\x0Bquery" unmatched — the matched
            # list AND gate_pass diverged. Both engines must now
            # normalize (and match) identically.
            d["text"][i] = "a slow\x0bquery and a big\x0ctable end"
        elif k == 30:
            # NFC/NFD + lookalike gauntlet INSIDE blocklist phrases: the
            # normalizer folds [A-Z] only, so 'quéry' (NFD mark),
            # 'ſlow' (long s U+017F, a LOWER-case alias of s under full
            # Unicode folding), and NBSP-separated 'slow query' must
            # all MISS on BOTH engines — pins the documented boundary
            # that Unicode aliasing never enters the match.
            d["text"][i] = (
                "ſlow query quéry slow query café café"
            )

        # keep n_chars consistent with the mutated text
        d["n_chars"][i] = len(d["text"][i]) if d["text"][i] is not None else 0
    return pa.table(d, schema=tbl.schema)


def _mutate_events(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["event_id"])
    epoch0 = dt.datetime(1970, 1, 1)
    pre1970 = dt.datetime(1969, 12, 31, 23, 30, 0)
    for i in range(n):
        k = i % 41
        if k == 0:
            d["ts"][i] = epoch0
        elif k == 1:
            d["ts"][i] = pre1970
        elif k == 2:
            d["props"][i] = None
        elif k == 3:
            d["props"][i] = "not json at all"
        elif k == 4:
            d["props"][i] = "{}"
        elif k == 5:
            d["props"][i] = '{"k": null}'
        elif k == 6:
            d["value"][i] = 0.0
        elif k == 7:
            d["value"][i] = 0.005  # half-cent rounding edge
        elif k == 8 and i > 0:
            d["ts"][i] = d["ts"][i - 1]  # exact ts tie (ordering edge)
        elif k == 9:
            d["event_type"][i] = None  # NULL group-by / funnel key
        elif k == 10:
            d["user_id"][i] = None  # NULL partition/session/join key
        elif k == 11:
            d["value"][i] = float("nan")  # non-finite metric
        elif k == 12:
            d["value"][i] = float("inf")
        # fuzz round 4 classes
        elif k == 13:
            d["value"][i] = 1.0e20  # finite but overflows DECIMAL(18,2)
        elif k == 14 and i > 0:
            for col in d:  # full-row duplicate (at-least-once delivery)
                d[col][i] = d[col][i - 1]
        elif k == 15:
            d["ts"][i] = dt.datetime(9999, 12, 30, 12, 0, 0)
        elif k == 16:
            d["user_id"][i] = -(2**62)  # extreme negative key
        elif k == 17:
            d["event_type"][i] = ""  # empty string ≠ NULL group
        # fuzz round 5 classes
        elif k == 18:
            d["props"][i] = '{"k": {"nested": [1, 2]}, "s": "q\\"uote"}'
        elif k == 19:
            d["user_id"][i] = 2**62  # extreme POSITIVE key
        elif k == 20:
            d["value"][i] = -1.0e20  # huge NEGATIVE finite metric
        elif k == 21:
            d["ts"][i] = dt.datetime(2262, 4, 10)  # just under nanos max
        elif k == 22:
            d["event_type"][i] = "тип-événement-種類"  # unicode key
        # fuzz round 6 classes
        elif k == 23:
            d["ts"][i] = None  # NULL timestamp (unparseable source row)
        elif k == 24:
            d["value"][i] = -0.0  # negative zero (sign/floor edges)
        elif k == 25:
            d["event_type"][i] = " click "  # untrimmed group key
        elif k == 26:
            d["props"][i] = "[1, 2, 3]"  # top-level JSON array, no $.k
        elif k == 27:
            d["user_id"][i] = 0  # zero key (sentinel-collision probe)
        # fuzz round 7 classes
        elif k == 28 and i > 0:
            # DUPLICATE event_id with a DIFFERENT payload (at-least-once
            # delivery where the retry carried new data): every tiebreak
            # kernel that assumes event_id is a total order now has a
            # genuine tie — row_number picks arbitrarily per engine
            d["event_id"][i] = d["event_id"][i - 1]
        elif k == 29:
            # sub-millisecond PRE-epoch instant: -1 µs. Truncating
            # µs→ms arithmetic gives 0 ms, flooring gives -1 ms — the
            # trunc-vs-floor class on the time axis itself
            d["ts"][i] = dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
        elif k == 30:
            # sub-ms POST-epoch instant (pairs with k=29): .9995 ms
            d["ts"][i] = dt.datetime(1970, 1, 1, 0, 0, 0, 999)
        # fuzz round 8 classes
        elif k == 31:
            # DUPLICATE JSON keys: RFC 8259 leaves the winner undefined
            # (first-match vs last-match differs across parsers)
            d["props"][i] = '{"k": 1, "k": 2}'
        elif k == 32:
            # integer wider than int64 inside JSON: extraction + cast
            # overflow behavior is engine-implemented
            d["props"][i] = '{"k": 123456789012345678901234567890}'
        elif k == 33:
            # 30-level nested JSON: parser depth limits differ
            d["props"][i] = '{"k":' * 30 + '1' + '}' * 30
        elif k == 34:
            # invisible non-empty group key (zero-width joiner only)
            d["event_type"][i] = "\u200d"
        elif k == 35:
            # proleptic-calendar floor: year 1 timestamp (pre-Julian
            # switch; epoch arithmetic is ~-62e15 us, within int64)
            d["ts"][i] = dt.datetime(1, 1, 1, 0, 0, 0)
        elif k == 36:
            # large metric that is NOT exactly representable as a double
            # (123456789012.34 rounds to ...339996...): probes the
            # double->DECIMAL(18,2) rounding-rule parity at scale while
            # keeping every grouped cents SUM far inside BIGINT (the
            # 9999999999999998.0 variant overflowed per-type sums at
            # ~1500 mutated rows x 1e18 cents - both engines failed,
            # differently)
            d["value"][i] = 123456789012.34
        # fuzz round 9 classes
        elif k == 37:
            # JSON string value carrying ESCAPED surrogate-pair emoji and
            # an escaped NUL: \u-unescaping is parser-implemented (JVM
            # UTF-16 vs DuckDB yyjson UTF-8), so length/compare kernels
            # over extracted values probe the unescape parity
            d["props"][i] = '{"k": "\\ud83d\\ude00 pre\\u0000post"}'
        elif k == 38:
            # JSON number overflowing DOUBLE range: 1e309 parses to
            # +inf, an error, or NULL depending on the parser
            d["props"][i] = '{"k": 1e309}'
        elif k == 39:
            # DOTTED key plus a real 'k': $.k path syntax vs map-style
            # lookup may treat 'a.b' as a nested path on one engine
            d["props"][i] = '{"a.b": 7, "k": 3}'
        elif k == 40:
            d["event_id"][i] = 2**63 - 1  # max int64 id: any +1/interval
            # tiebreak or keyset-pagination bound overflows BIGINT
        # fuzz round 11 classes (k rolls modulo 41, so round-11 events
        # mutations reuse k slots via the secondary residue below)
        if i % 43 == 41:
            d["props"][i] = ""  # EMPTY-string props: not NULL, not JSON
        elif i % 43 == 42:
            d["props"][i] = "123"  # valid JSON, top-level NUMBER scalar
        # fuzz round 13 classes (tertiary residue axis — k and i%43 are
        # exhausted): DST-transition instants. The engine pins UTC
        # (tune_session) and the env sweep re-runs every query under
        # America/New_York and Asia/Tokyo sessions — these rows make a
        # session-tz LEAK actually change answers: an instant inside the
        # US spring-forward gap buckets to a different local hour/day,
        # and the fall-back hour is AMBIGUOUS in local time, so any
        # date_trunc/dayofweek that resolves via session tz diverges.
        if i % 47 == 44:
            # 2021-03-14 07:00:00Z == 02:00 EST -> 03:00 EDT gap start
            d["ts"][i] = dt.datetime(2021, 3, 14, 7, 0, 0)
        elif i % 47 == 45:
            # first of the two instants that both read 01:30 local in
            # the US fall-back hour (2021-11-07, EDT side)
            d["ts"][i] = dt.datetime(2021, 11, 7, 5, 30, 0)
        elif i % 47 == 46:
            # 1 µs before the EU CET->CEST jump (2021-03-28 01:00Z)
            d["ts"][i] = dt.datetime(2021, 3, 28, 0, 59, 59, 999999)
    return pa.table(d, schema=tbl.schema)


def _mutate_embeddings(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["vec_id"])
    for i in range(n):
        k = i % 29
        if k == 0:
            d["embedding"][i] = [0.0] * len(d["embedding"][i])  # zero norm
        elif k == 1 and i > 0:
            d["embedding"][i] = list(d["embedding"][i - 1])  # exact dup
        elif k == 2:
            d["embedding"][i] = [1.0] + [0.0] * (len(d["embedding"][i]) - 1)
        elif k == 3:
            v = list(d["embedding"][i])
            v[0] = float("nan")  # NaN component (failed encoder row)
            d["embedding"][i] = v
        # fuzz round 4 classes
        elif k == 4:
            d["embedding"][i] = [float("nan")] * len(d["embedding"][i])
        elif k == 5:
            v = list(d["embedding"][i])
            v[0] = 1.0e30  # huge finite component (scale-overflow probe)
            d["embedding"][i] = v
        # fuzz round 6 classes
        elif k == 6:
            d["embedding"][i] = [0.5, -0.5]  # ragged short vector
        elif k == 7:
            d["embedding"][i] = []  # empty vector
        elif k == 8:
            d["embedding"][i] = None  # NULL vector (failed encoder row)
        # fuzz round 7 classes
        elif k == 9:
            # ALL-IDENTICAL constant vector cluster (~4% of the corpus):
            # exact cosine ties in every ANN top-k (tiebreak must be
            # total), zero within-cluster variance, and a MinHash/LSH
            # bucket whose every candidate pair is an exact duplicate
            d["embedding"][i] = [0.25] * len(d["embedding"][i])
        elif k == 10:
            # denormal-magnitude components: norm underflows toward 0
            # but is NOT exactly zero — probes the nz_base epsilon vs
            # exact-zero universe split
            d["embedding"][i] = [5e-324] * len(d["embedding"][i])
        # fuzz round 8 classes
        elif k == 11:
            # ragged LONG vector (DIM+1): fixed-index universes that
            # whitelist len()=DIM must also exclude the over-long row,
            # and index DIM+1 EXISTS here (no OOB-NULL mask)
            d["embedding"][i] = [0.1] * (len(d["embedding"][i]) + 1)
        elif k == 12:
            # mixed +/- infinity components (isfinite vs isnan guards)
            v = list(d["embedding"][i])
            v[0], v[1] = float("inf"), float("-inf")
            d["embedding"][i] = v
        elif k == 13:
            # negative-zero components: sign(0) and hash-bucket edges
            d["embedding"][i] = [-0.0] * len(d["embedding"][i])
        # fuzz round 9 classes
        elif k == 14:
            d["embedding"][i] = [7.5]  # single-element vector (ragged
            # SHORT beyond the k=6 two-element case; mean/var with n=1)
        elif k == 15 and i + 1 < n:
            # DUPLICATE vec_id with a DIFFERENT embedding: ANN joins on
            # vec_id fan out; top-k tiebreaks on (score, vec_id) now tie
            # on BOTH and need a content-level total order
            d["vec_id"][i] = d["vec_id"][i + 1]
    return pa.table(d, schema=tbl.schema)


def _mutate_orders(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["o_orderkey"])
    for i in range(n):
        k = i % 23
        if k == 0 and i > 0:
            d["o_orderdate"][i] = d["o_orderdate"][i - 1]  # date tie
        elif k == 1:
            d["o_totalprice"][i] = 0.0
        elif k == 2 and i > 0:
            d["o_totalprice"][i] = d["o_totalprice"][i - 1]  # exact tie
        # fuzz round 4 classes
        elif k == 3:
            d["o_totalprice"][i] = -123.45  # refund / chargeback row
        # fuzz round 5 classes
        elif k == 4:
            d["o_orderdate"][i] = dt.datetime(9999, 12, 30)
        elif k == 5:
            d["o_orderdate"][i] = dt.datetime(1969, 6, 1)
        # fuzz round 6 classes
        elif k == 6:
            d["o_custkey"][i] = None  # NULL FK (inner drop vs outer keep)
        elif k == 7:
            d["o_orderstatus"][i] = None  # NULL enum/group key
        # fuzz round 7 classes
        elif k == 8:
            d["o_orderdate"][i] = None  # NULL date (SCD2/backtest axis)
        elif k == 9:
            d["o_totalprice"][i] = 0.005  # half-cent boundary price
        # fuzz round 8 classes
        elif k == 10:
            d["o_orderpriority"][i] = None  # NULL cube/grouping-sets key
        elif k == 11:
            # proleptic-calendar date floor (year 1)
            d["o_orderdate"][i] = dt.datetime(1, 1, 2)
        # fuzz round 9 classes
        elif k == 12:
            # NaN price: both engines sort NaN greatest, but NaN
            # equality/grouping and SUM-poisoning semantics are
            # engine-implemented (Spark NaN==NaN in grouping; any
            # SUM over a NaN partition is NaN on both — verify)
            d["o_totalprice"][i] = float("nan")
        elif k == 13:
            d["o_orderstatus"][i] = ""  # empty-string enum (≠ NULL k=7)
        # fuzz round 10 classes
        elif k == 14 and i > 0:
            # DUPLICATE o_orderkey with a different payload: the orders
            # PK collides — lineitem joins fan out, keyset pagination and
            # (price, orderkey) tiebreaks gain genuine ties
            d["o_orderkey"][i] = d["o_orderkey"][i - 1]
        # fuzz round 11 classes
        elif k == 15:
            # sub-millisecond PRE-epoch instant on the ORDER date axis
            # (the class-26 floor-vs-trunc probe moved from events.ts)
            d["o_orderdate"][i] = dt.datetime(1969, 12, 31, 23, 59, 59, 999999)
        elif k == 16:
            d["o_totalprice"][i] = 5e-324  # denormal price: cents cast
            # rounds to 0.00 — must do so identically both engines
    return pa.table(d, schema=tbl.schema)


def _mutate_lineitem(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["l_orderkey"])
    for i in range(n):
        k = i % 23
        if k == 0:
            d["l_shipdate"][i] = dt.datetime(1969, 6, 1)  # pre-1970 ship
        elif k == 1:
            d["l_quantity"][i] = 0.0
        elif k == 2:
            d["l_discount"][i] = 1.0  # 100% discount (zero revenue term)
        elif k == 3 and i > 0:
            # duplicate composite PK (l_orderkey, l_linenumber)
            d["l_orderkey"][i] = d["l_orderkey"][i - 1]
            d["l_linenumber"][i] = d["l_linenumber"][i - 1]
        elif k == 4:
            d["l_shipdate"][i] = dt.datetime(9999, 12, 30)
        # fuzz round 6 classes
        elif k == 5:
            d["l_returnflag"][i] = None  # NULL grouping flag
        elif k == 6:
            d["l_quantity"][i] = -3.0  # negative quantity (correction row)
        # fuzz round 7 classes
        elif k == 7:
            # FRACTIONAL positive quantity (bulk goods sold by weight):
            # the ADVICE-r6 class — a raw BIGINT cast of the weight
            # rounds in DuckDB but truncates in Spark
            d["l_quantity"][i] = 2.5
        elif k == 8:
            # sub-cent price on the half-cent boundary: the
            # double→DECIMAL(18,2) cast's rounding is engine-implemented
            d["l_extendedprice"][i] = 100.005
        # fuzz round 8 classes
        elif k == 9:
            # NEGATIVE discount (rebate reversal): (1 - d) > 1, so any
            # kernel clamping discount to [0, 1] diverges
            d["l_discount"][i] = -0.25
        elif k == 10:
            d["l_tax"][i] = None  # NULL tax: q1's sum_charge term
        elif k == 11:
            # epoch-boundary ship date: the one date axis every
            # pre/post-1970 trunc-vs-floor class pivots on
            d["l_shipdate"][i] = dt.datetime(1970, 1, 1)
        # fuzz round 9 classes
        elif k == 12:
            d["l_shipdate"][i] = None  # NULL ship date (range filters,
            # as-of axes, interval arithmetic all see a NULL endpoint)
        elif k == 13:
            d["l_extendedprice"][i] = float("nan")  # NaN fact measure:
            # poisons one group's DECIMAL cast — cast(NaN as DECIMAL) is
            # NULL in one engine, an error or NaN in another
        elif k == 14:
            d["l_linenumber"][i] = 0  # zero ordinal (1-based assumptions)
        # fuzz round 10 classes: the class-34 NaN probe on EVERY other
        # decimal-cast double column (round 9 only poisoned the price)
        elif k == 15:
            d["l_quantity"][i] = float("nan")
        elif k == 16:
            d["l_discount"][i] = float("nan")
        elif k == 17:
            d["l_tax"][i] = float("nan")
    return pa.table(d, schema=tbl.schema)


def _mutate_customer(tbl: pa.Table) -> pa.Table:
    """Fuzz round 10: first mutations of the dimension side."""
    d = tbl.to_pydict()
    n = len(d["c_custkey"])
    for i in range(n):
        k = i % 19
        if k == 0:
            d["c_acctbal"][i] = float("nan")  # class-34 probe (q10/q22)
        elif k == 1:
            d["c_acctbal"][i] = float("inf")
        elif k == 2:
            d["c_mktsegment"][i] = None  # NULL dim attribute
        elif k == 3:
            d["c_name"][i] = "Çustömer#İ‍"  # unicode + ZWJ name
        elif k == 4:
            d["c_nationkey"][i] = None  # NULL FK to nation
        # fuzz round 12: customer PK collision (different payloads)
        elif k == 5 and i > 0:
            d["c_custkey"][i] = d["c_custkey"][i - 1]
    return pa.table(d, schema=tbl.schema)


def _mutate_supplier(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["s_suppkey"])
    for i in range(n):
        k = i % 17
        if k == 0:
            d["s_acctbal"][i] = float("nan")  # class-34 probe (q2-shape)
        elif k == 1:
            d["s_nationkey"][i] = None  # NULL FK
    return pa.table(d, schema=tbl.schema)


def _mutate_part(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["p_partkey"])
    for i in range(n):
        k = i % 17
        if k == 0:
            d["p_retailprice"][i] = float("nan")  # class-34 probe (q9)
        elif k == 1:
            d["p_brand"][i] = None  # NULL group/filter key
        elif k == 2:
            d["p_type"][i] = ""  # empty-string LIKE/prefix probe
        elif k == 3:
            d["p_size"][i] = -1  # negative size (range predicates)
        # fuzz round 12 classes
        elif k == 4:
            d["p_name"][i] = None  # NULL name: split/array kernels
        elif k == 5:
            d["p_name"][i] = ""  # empty name: [''] token lists
    return pa.table(d, schema=tbl.schema)


def _mutate_nation(tbl: pa.Table) -> pa.Table:
    """Fuzz round 11: the join dimensions get hostile. nation is 25 rows
    and broadcast into almost every TPC-H join, so one bad row hits
    many queries at once."""
    d = tbl.to_pydict()
    n = len(d["n_nationkey"])
    if n >= 4:
        d["n_name"][1] = None          # NULL dimension NAME (group key)
        d["n_regionkey"][2] = None     # NULL FK to region
        # fuzz round 12: dimension PK COLLISION — two nations share a
        # key with different names; every broadcast equi-join fans out
        d["n_nationkey"][3] = d["n_nationkey"][0]
    return pa.table(d, schema=tbl.schema)


def _mutate_region(tbl: pa.Table) -> pa.Table:
    d = tbl.to_pydict()
    n = len(d["r_regionkey"])
    if n >= 3:
        d["r_name"][1] = "ASIA "       # trailing-space variant of a
        # filtered literal: r_name = 'ASIA' must NOT match it on either
        # engine (probes any trimming/padding divergence)
        d["r_name"][2] = None          # fuzz round 12: NULL region name
    return pa.table(d, schema=tbl.schema)


_MUTATORS = {
    "documents": _mutate_documents,
    "events": _mutate_events,
    "embeddings": _mutate_embeddings,
    "orders": _mutate_orders,
    "lineitem": _mutate_lineitem,
    "customer": _mutate_customer,
    "supplier": _mutate_supplier,
    "part": _mutate_part,
    "nation": _mutate_nation,
    "region": _mutate_region,
}


def build(src: str, dest: str) -> None:
    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[: -len(".parquet")]
        src_path = os.path.join(src, fname)
        dst_path = os.path.join(dest, fname)
        mut = _MUTATORS.get(name)
        if mut is None:
            shutil.copyfile(src_path, dst_path)
            continue
        tbl = pq.read_table(src_path)
        pq.write_table(mut(tbl), dst_path)
        print(f"mutated {name}: {tbl.num_rows} rows")


def build_shuffled(src: str, dest: str) -> None:
    """Fuzz round 14 (order axis): every table's rows in a DIFFERENT,
    deterministic permutation (md5 of the row index). No query may
    depend on file row order — every LIMIT carries a total-order sort,
    every reassembly orders explicitly — so the full differential must
    be byte-identical to the canonical run's semantics on both engines."""
    import hashlib

    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(src, fname))
        n = tbl.num_rows
        order = sorted(
            range(n),
            key=lambda i: hashlib.md5(f"{fname}:{i}".encode()).hexdigest(),
        )
        pq.write_table(tbl.take(order), os.path.join(dest, fname))
        print(f"shuffled {fname[:-8]}: {n} rows")


def build_truncated(src: str, dest: str, n: int) -> None:
    """Fuzz round 13 (c): DEGENERATE-CARDINALITY variant — every table
    truncated to its first ``n`` rows (n=0: the empty-table axis every
    aggregate/window/seeded operator must survive; n=1: the single-row
    axis that zeroes every variance, pairs every self-join with itself,
    and collapses every quantile). Schemas are preserved exactly (slice,
    not filter), so the differential isolates CARDINALITY semantics —
    empty-input aggregates, 0-denominator guards, seed collection from
    empty frames — from content effects."""
    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(src, fname))
        pq.write_table(tbl.slice(0, n), os.path.join(dest, fname))
        print(f"truncated {fname[:-8]}: {tbl.num_rows} -> {min(n, tbl.num_rows)} rows")


#: Fuzz round 14 (storage axis): same DATA, different PHYSICAL parquet
#: layout. The driver regenerates fixtures between rounds and has already
#: changed time encodings twice (tables.py header); these variants cover
#: the remaining writer knobs a regeneration could plausibly flip. The
#: differential then runs Spark AND DuckDB over the SAME recoded files —
#: a divergence is a reader-level decode difference, the class that
#: round-2's nanos change exposed.
def build_evolved(src: str, dest: str) -> None:
    """Fuzz 16, class 52: SCHEMA EVOLUTION inside one directory-table.

    ``documents.parquet`` becomes a DIRECTORY whose member files disagree
    on column names — the layout a rolling regeneration leaves behind:

    - ``part-a`` (sorts FIRST): the first half of the rows with the
      ``source`` column DROPPED — adversarial listing order, so a reader
      that takes the first footer as the table schema loses ``source``
      for the whole table (and the REQUIRED_COLUMNS canary would fire);
    - ``part-b``: the rest of the rows with the full schema PLUS an
      added ``_ingest_batch`` column.

    Contract under evolution (both engines): the table is the column
    NAME UNION, absent cells are NULL — Spark via conditional
    ``mergeSchema`` (tables._needs_schema_merge), DuckDB via
    ``union_by_name := true``. Every other table copies through.
    """
    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        if fname == "events.parquet":
            # second evolved table: the fact-table variant — one member
            # DROPS the optional `props` JSON column (a regeneration
            # that stopped carrying raw payloads). Queries touching
            # props must see NULL for those rows on BOTH engines.
            tbl = pq.read_table(os.path.join(src, fname))
            half = tbl.num_rows // 2
            edir = os.path.join(dest, fname)
            os.makedirs(edir, exist_ok=True)
            pq.write_table(
                tbl.slice(0, half).drop_columns(["props"]),
                os.path.join(edir, "part-a.parquet"),
            )
            pq.write_table(tbl.slice(half), os.path.join(edir, "part-b.parquet"))
            print(f"evolved events: {half} reduced + {tbl.num_rows - half} full rows")
            continue
        if fname != "documents.parquet":
            shutil.copyfile(os.path.join(src, fname), os.path.join(dest, fname))
            continue
        tbl = pq.read_table(os.path.join(src, fname))
        half = tbl.num_rows // 2
        ddir = os.path.join(dest, fname)
        os.makedirs(ddir, exist_ok=True)
        first = tbl.slice(0, half).drop_columns(["source"])
        pq.write_table(first, os.path.join(ddir, "part-a.parquet"))
        rest = tbl.slice(half)
        batch = pa.array(["b1"] * rest.num_rows, type=pa.string())
        pq.write_table(
            rest.append_column("_ingest_batch", batch),
            os.path.join(ddir, "part-b.parquet"),
        )
        # a 0-ROW member with the original schema (an aborted/empty
        # regeneration batch): both engines must treat it as pure
        # metadata — zero rows contributed, schema still unioned
        pq.write_table(tbl.slice(0, 0), os.path.join(ddir, "part-c.parquet"))
        print(f"evolved documents: {half} reduced + {rest.num_rows} extended rows + 1 empty member")


#: fuzz 17 (class 53): deterministic Unicode-hostile group keys driven
#: through the novelty/DSIR group-bys — RTL marks, NFD vs NFC of the
#: same glyph (distinct code points, must stay distinct keys on BOTH
#: engines), astral-plane chars (UTF-8 byte order == code-point order,
#: so min()/ordering agree), soft hyphen, empty and whitespace-only keys
_HOSTILE_SOURCES = ("wéb—𝔘ñî", "ar‏مض", "én-nfd", "", " ", "zz­zz")
_HOSTILE_LANGS = ("én", "EN", "zh-汉", "")


def build_evolved_deep(src: str, dest: str) -> None:
    """Fuzz 17, class 53: schema evolution DEEPENED — members of one
    directory-table disagree on TYPES and COLUMN ORDER, not just names,
    composed with hostile encodings and hostile content (r10 verdict #7).

    ``documents.parquet`` becomes a directory of three members:

    - ``part-a`` (sorts FIRST): first third with ``doc_id``/``n_chars``
      NARROWED to int32 (values fit), ``source`` DROPPED, columns
      reordered text-first, dictionary off + 97-row groups — a reader
      that takes this footer as the table schema narrows every int64 in
      the table and loses ``source``;
    - ``part-b``: second third, full schema plus ``_ingest_batch``, and
      a deterministic slice of rows carrying Unicode-hostile
      ``source``/``lang`` keys (doc_id % 7 == 0 → one of
      ``_HOSTILE_SOURCES``/``_HOSTILE_LANGS`` by doc_id) — these flow
      through the novelty/DSIR group-bys;
    - ``part-c``: last third with column order REVERSED.

    ``events.parquet`` becomes a directory of two members:

    - ``part-a`` (sorts first): first half with ``event_id`` int32,
      ``value`` float32 (silent-narrowing bait) and ``props`` dropped;
    - ``part-b``: rest, full schema, BYTE_STREAM_SPLIT on doubles —
      the class-49 transcode and the class-53 union must COMPOSE (the
      union schema is computed over the transcoded shadow directory).

    Contract on both engines: column-name union, NULL for absent cells,
    narrow members UPCAST (int32→int64, float32→float64) — Spark via
    tables._union_read_schema's explicit Arrow-unified read schema,
    DuckDB via ``union_by_name := true``. Every other table copies
    through."""
    import pyarrow.compute as pc

    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        if fname == "documents.parquet":
            tbl = pq.read_table(os.path.join(src, fname))
            third = tbl.num_rows // 3
            ddir = os.path.join(dest, fname)
            os.makedirs(ddir, exist_ok=True)
            a = tbl.slice(0, third).drop_columns(["source"])
            a = a.set_column(
                a.schema.get_field_index("doc_id"), "doc_id",
                pc.cast(a["doc_id"], pa.int32()))
            a = a.set_column(
                a.schema.get_field_index("n_chars"), "n_chars",
                pc.cast(a["n_chars"], pa.int32()))
            a = a.select(["text", "doc_id", "lang", "n_chars"])
            pq.write_table(
                a, os.path.join(ddir, "part-a.parquet"),
                use_dictionary=False, row_group_size=97)
            b = tbl.slice(third, third)
            ids = b["doc_id"].to_pylist()
            srcs, langs = b["source"].to_pylist(), b["lang"].to_pylist()
            for i, did in enumerate(ids):
                if did % 7 == 0:
                    srcs[i] = _HOSTILE_SOURCES[did % len(_HOSTILE_SOURCES)]
                    langs[i] = _HOSTILE_LANGS[did % len(_HOSTILE_LANGS)]
            b = b.set_column(
                b.schema.get_field_index("source"), "source",
                pa.array(srcs, pa.string()))
            b = b.set_column(
                b.schema.get_field_index("lang"), "lang",
                pa.array(langs, pa.string()))
            b = b.append_column(
                "_ingest_batch", pa.array(["b1"] * b.num_rows, pa.string()))
            pq.write_table(b, os.path.join(ddir, "part-b.parquet"))
            c = tbl.slice(2 * third)
            c = c.select(list(reversed(c.schema.names)))
            pq.write_table(c, os.path.join(ddir, "part-c.parquet"))
            print(f"deep-evolved documents: {third} narrowed+reduced / "
                  f"{third} hostile-keyed / {c.num_rows} reversed")
            continue
        if fname == "events.parquet":
            tbl = pq.read_table(os.path.join(src, fname))
            half = tbl.num_rows // 2
            edir = os.path.join(dest, fname)
            os.makedirs(edir, exist_ok=True)
            a = tbl.slice(0, half).drop_columns(["props"])
            a = a.set_column(
                a.schema.get_field_index("event_id"), "event_id",
                pc.cast(a["event_id"], pa.int32()))
            a = a.set_column(
                a.schema.get_field_index("value"), "value",
                pc.cast(a["value"], pa.float32()))
            pq.write_table(a, os.path.join(edir, "part-a.parquet"))
            b = tbl.slice(half)
            import pyarrow.types as pt
            enc = {f.name: "BYTE_STREAM_SPLIT" for f in b.schema
                   if pt.is_floating(f.type)}
            pq.write_table(
                b, os.path.join(edir, "part-b.parquet"),
                use_dictionary=False, column_encoding=enc or None,
                compression="snappy")
            print(f"deep-evolved events: {half} narrowed/reduced + "
                  f"{b.num_rows} full BSS rows")
            continue
        shutil.copyfile(os.path.join(src, fname), os.path.join(dest, fname))


RECODE_VARIANTS = ("nodict_bss", "tiny_rowgroups_v2", "gzip_reordered_extra", "ts_ms")


def build_recoded(src: str, dest: str, variant: str) -> None:
    import pyarrow.types as pt

    os.makedirs(dest, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(src, fname))
        out = os.path.join(dest, fname)
        if variant == "nodict_bss":
            # plain encoding everywhere + BYTE_STREAM_SPLIT for floats —
            # the layout a column-stats-optimizing writer emits
            enc = {
                f.name: "BYTE_STREAM_SPLIT"
                for f in tbl.schema
                if pt.is_floating(f.type)
            }
            pq.write_table(
                tbl, out,
                use_dictionary=False,
                column_encoding=enc or None,
                compression="snappy",
            )
        elif variant == "tiny_rowgroups_v2":
            # many tiny row groups (scan/split boundaries inside every
            # table) + DataPage V2 + zstd
            pq.write_table(
                tbl, out,
                row_group_size=97,
                data_page_version="2.0",
                compression="zstd",
            )
        elif variant == "gzip_reordered_extra":
            # reversed column order + an EXTRA column (schema evolution:
            # engines must select by NAME and ignore unknowns) + gzip
            rev = tbl.select(list(reversed(tbl.column_names)))
            extra = pa.array(
                [f"m{i % 7}" for i in range(tbl.num_rows)], type=pa.string()
            )
            rev = rev.append_column("_extra_meta", extra)
            pq.write_table(rev, out, compression="gzip")
        elif variant == "ts_ms":
            # millisecond-coerced timestamps (a plausible future fixture
            # precision change; µs components truncate identically for
            # both readers since the FILE is the shared truth)
            pq.write_table(
                tbl, out,
                coerce_timestamps="ms",
                allow_truncated_timestamps=True,
                compression="snappy",
            )
        else:
            raise ValueError(f"unknown recode variant {variant!r}")
        print(f"recoded {fname[:-8]} [{variant}]: {tbl.num_rows} rows")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/root/testdata/sf0.001"
    dest = args[1] if len(args) > 1 else "/tmp/hostile_sf0.001"
    recode = [a for a in sys.argv if a.startswith("--recode=")]
    if "--shuffle-rows" in sys.argv:
        build_shuffled(src, dest)
    elif "--truncate0" in sys.argv:
        build_truncated(src, dest, 0)
    elif "--truncate1" in sys.argv:
        build_truncated(src, dest, 1)
    elif recode:
        build_recoded(src, dest, recode[0].split("=", 1)[1])
    else:
        build(src, dest)
    print(f"hostile fixtures at {dest}; now run: "
          f"python tools/check_oracle.py {dest}")
