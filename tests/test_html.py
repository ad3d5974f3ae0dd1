"""Main-content extraction (operators/html.py): boilerplate strip,
DOM-heuristic main-block pick, layout reading order — semantic checks
(cross-engine hashes live in test_entry_contract)."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lamda mu nu xi omicron pi rho sigma tau upsilon"),
        ("d2", "one two three four"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_html_strip_semantics(spark, docs):
    from ocr_pytorch_spark.operators.html import html_strip

    rows = {r["doc_id"]: r for r in html_strip(docs).collect()}
    r = rows["d1"]
    assert r["title"] == "Doc d1 - Corpus"
    # script/style bodies removed, tags gone, entities decoded
    assert "var t" not in r["clean_text"]
    assert "margin" not in r["clean_text"]
    assert "<" not in r["clean_text"]
    assert "Terms & Privacy (c) corpus" in r["clean_text"]
    # the document's words survive
    assert "alpha" in r["clean_text"] and "upsilon" in r["clean_text"]
    assert r["n_links"] == 8  # 3 nav + 3 ad + 2 footer
    assert 0 < r["link_density"] < 1


def test_html_main_block_prefers_content(spark, docs):
    from ocr_pytorch_spark.operators.html import html_main_block

    rows = {r["doc_id"]: r for r in html_main_block(docs).collect()}
    # the long doc's winner is a content block (not nav/ad/footer):
    # zero-link text, carrying document words
    win = rows["d1"]["block_text"]
    assert "BUY NOW" not in win and "Home" not in win
    # the <main> block (second word half + tail) wins on text x
    # (1 - link_density)
    assert "upsilon" in win and win.endswith("tail & end")


def test_layout_reading_order_deterministic(spark):
    from ocr_pytorch_spark.operators.html import layout_reading_order

    # 80 words = 2 pages x 2 columns x 20 rows
    words = [f"w{i:03d}" for i in range(80)]
    docs = spark.createDataFrame([("d", " ".join(words))],
                                 "doc_id string, text string")
    out = layout_reading_order(docs).collect()[0]["reading_text"]
    got = out.split(" ")
    # reading order = page asc, column asc, y asc: with the serpentine
    # synthetic layout that is exactly the original index order
    assert got == words
    # determinism across runs
    out2 = layout_reading_order(docs).collect()[0]["reading_text"]
    assert out2 == out


def test_query_ordering_keeps_oracle_bearing_first():
    """The driver checks ~50 queries in dict order — the head must be
    all oracle-bearing and the never-verified keys must lead."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    keys = list(q)
    head = keys[:50]
    assert all(k in o for k in head), \
        [k for k in head if k not in o]
    assert set(o) <= set(q)


def test_never_driver_checked_keys_sort_into_next_window():
    """r7 VERDICT task 1: five r7 debut keys were filed mid-group and
    shipped with ZERO driver rows.  The debut rule is now mechanical
    (_rotate promotes from _driver_checked_keys()), and this test is
    the red-if-reverted guard: every oracle key with no row in ANY
    existing CORRECTNESS_r*.json — and no certifying suite with a
    row — must appear in the next driver window (first 50 keys),
    regardless of group placement."""
    import __spark_entry__ as E

    checked = E._driver_checked_keys()
    member_suite = {m: s for s, ms in E._SUITES.items() for m in ms}
    o = set(E.oracle_sql())
    never = {k for k in o
             if k not in checked
             and member_suite.get(k) not in checked}
    window = set(list(E.queries())[:50])
    missing = {k for k in never
               if k not in window
               and member_suite.get(k) not in window}
    assert not missing, (
        f"oracle keys never driver-checked AND outside the next "
        f"window: {sorted(missing)}")
    # the promotion hook itself: never-checked non-member keys sit
    # immediately after the pinned keys, ahead of every veteran
    keys = list(E.queries())
    n_pin = len(E._PINNED)
    promoted = {k for k in never if k not in E._SUITE_MEMBERS}
    if promoted:
        head = set(keys[n_pin:n_pin + len(promoted)])
        assert head == promoted, (sorted(head), sorted(promoted))


def test_rotation_schedule_invariants():
    """The deterministic driver-verification rotation
    (__spark_entry__._rotate): pinned flagships lead every round, the
    two rotation groups exactly partition the oracle-bearing keys,
    and the round-leading group fits the 50-key window entirely —
    every oracle key is in-window at least every 2 rounds."""
    import __spark_entry__ as E

    q, o = E.queries(), set(E.oracle_sql())
    keys = list(q)
    assert keys[:len(E._PINNED)] == E._PINNED
    groups = [set(E._PINNED), set(E._ROT_ODD), set(E._ROT_EVEN),
              set(E._ROT_SLOW), set(E._SUITE_MEMBERS)]
    listed = set().union(*groups)
    # strict partition: every oracle key is pinned, in exactly one
    # tier, a suite member (driver presence = its suite's hash), or
    # explicitly declared as debuting this round
    assert listed | set(E._ROT_DEBUT) == o, \
        (sorted(o - listed - set(E._ROT_DEBUT)), sorted(listed - o))
    assert not (listed & set(E._ROT_DEBUT))
    assert sum(len(g) for g in groups) == len(listed)  # disjoint
    # every suite member is in exactly one suite, and every suite key
    # is itself oracle-bearing and in a rotation group
    flat = [m for ms in E._SUITES.values() for m in ms]
    assert len(flat) == len(set(flat))
    assert set(flat) == set(E._SUITE_MEMBERS)
    for sname in E._SUITES:
        assert sname in o
        assert sname in E._ROT_ODD or sname in E._ROT_EVEN
    # the leading group (+ pinned + debuts + the slow slice) fits
    lead = E._ROT_EVEN if E._round_number() % 2 == 0 else E._ROT_ODD
    new = [k for k in q if k in o and k not in listed]
    assert (len(E._PINNED) + len(new) + E._SLOW_PER_ROUND
            + len(lead)) <= 50
    assert set(E._PINNED + new + lead) <= set(keys[:50])
    # suite members never occupy window slots
    assert not set(keys[:50]) & set(E._SUITE_MEMBERS)
    # rows-only keys trail
    n_oracle = len(o)
    assert all(k not in o for k in keys[n_oracle:])


@pytest.mark.parametrize("rnd", [6, 7, 8, 9])
def test_rotation_window_fits_both_parities(monkeypatch, rnd):
    """The r5 handoff failed because the window fit was only asserted
    at the round parity the builder happened to run under — the
    driver then ran at the OTHER parity with an oversubscribed group.
    Assert the full window contract at both parities explicitly: the
    leading group (plus pinned plus debuts) fits the 50-key window at
    round N AND round N+1, so committing before the driver writes
    CORRECTNESS_r0N.json can never hide an oversubscribed window."""
    import __spark_entry__ as E

    monkeypatch.setattr(E, "_round_number", lambda: rnd)
    keys = list(E.queries())
    o = set(E.oracle_sql())
    assert keys[:len(E._PINNED)] == E._PINNED
    window = keys[:50]
    assert all(k in o for k in window)
    lead = E._ROT_EVEN if rnd % 2 == 0 else E._ROT_ODD
    core = (len(E._PINNED) + len(E._ROT_DEBUT) + E._SLOW_PER_ROUND
            + len(lead))
    # r6 VERDICT task 1: assert HEADROOM, not just fit — the schedule
    # must keep >= 5 free slots at BOTH parities so a new oracle key
    # is a plain append, never a demotion cascade
    assert core <= 45, (
        f"round {rnd} window headroom < 5: "
        f"{len(E._PINNED)} pinned + {len(E._ROT_DEBUT)} debut + "
        f"{E._SLOW_PER_ROUND} slow + {len(lead)} lead > 45")
    if E._ROT_SLOW:
        start = (rnd * E._SLOW_PER_ROUND) % len(E._ROT_SLOW)
        slow = {E._ROT_SLOW[(start + i) % len(E._ROT_SLOW)]
                for i in range(E._SLOW_PER_ROUND)}
    else:
        slow = set()
    assert (set(E._PINNED) | set(E._ROT_DEBUT) | slow
            | set(lead)) <= set(window)


def test_suite_specs_match_duckdb_types():
    """_SUITE_SPECS pins each suite member's (column, is_double)
    layout; this re-derives the table from DuckDB's actual result
    types at sf0.001 so schema drift in any member fails loudly
    before the driver sees a suite hash mismatch."""
    import duckdb

    import __spark_entry__ as E
    from tests.conftest import SF_SMALL

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_SMALL}/{t}.parquet'")
    oracles = E.oracle_sql()
    for member in sorted(E._SUITE_MEMBERS):
        rel = con.sql(f"SELECT * FROM ({oracles[member]}) _m LIMIT 0")
        derived = sorted(
            (c, 1 if str(t).upper() in ("DOUBLE", "FLOAT") else 0)
            for c, t in zip(rel.columns, rel.types))
        assert derived == sorted(E._SUITE_SPECS[member]), \
            (member, derived, E._SUITE_SPECS[member])


def test_rotation_cadence_bounds(monkeypatch):
    """Bounded staleness for every tier: any 2 consecutive rounds
    cover every oracle key either directly or via its certifying
    suite (2-round cadence for the whole contract after the r7
    restructure — the old 3-round _ROT_SLOW tier is gone)."""
    import __spark_entry__ as E

    o = set(E.oracle_sql())
    member_suite = {m: s for s, ms in E._SUITES.items() for m in ms}

    def window(rnd):
        monkeypatch.setattr(E, "_round_number", lambda r=rnd: r)
        return set(list(E.queries())[:50])

    wins = {rnd: window(rnd) for rnd in range(7, 12)}
    for rnd in range(7, 11):
        u = wins[rnd] | wins[rnd + 1]
        covered = {k for k in o
                   if k in u or member_suite.get(k) in u}
        assert o <= covered, (rnd, sorted(o - covered))


def test_boilerplate_rules_semantics(spark):
    """The WSDM-2010 rule cascade must actually separate content from
    chrome on the synthetic page: nav / ad / footer blocks are
    link-dense -> boilerplate; the <main> block of a long document is
    content; a short document's body blocks stay below the word
    thresholds -> everything is boilerplate."""
    from ocr_pytorch_spark.operators.html import boilerplate_classify

    long_text = " ".join(f"w{i:02d}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, long_text), (2, "just four tiny words")],
        "doc_id long, text string")
    rows = {(r["doc_id"], r["block_idx"]): r
            for r in boilerplate_classify(docs).collect()}
    # page block layout: 0 head-prefix, 1 nav, 2 ad, 3 <p> first half,
    # 4 <main> second half, 5 footer
    nav, ad, footer = rows[(1, 1)], rows[(1, 2)], rows[(1, 5)]
    assert nav["link_density"] > 0.333 and not nav["is_content"]
    assert ad["link_density"] > 0.333 and not ad["is_content"]
    assert footer["link_density"] > 0.333 and not footer["is_content"]
    p_blk, main_blk = rows[(1, 3)], rows[(1, 4)]
    # main = 30 second-half words + "tail & end" (entity-decoded)
    assert p_blk["n_words"] == 30 and main_blk["n_words"] == 33
    assert p_blk["is_content"] and main_blk["is_content"]
    # the short doc: body blocks carry <=4 words, no block passes the
    # word thresholds, and chrome stays chrome
    assert not any(r["is_content"] for (d, _), r in rows.items()
                   if d == 2)


def test_html_outlinks_anchor_corpus(spark):
    """Link harvest over the linked page: word-derived citation hosts
    aggregate across documents (n_links counts every link, n_docs is
    distinct linking docs), the fixed hub links contribute 2 per doc,
    and a short document clamps every word pick to its last word."""
    from ocr_pytorch_spark.operators.html import html_outlinks

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (2, "one two"),
         (3, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string")
    got = {r["dst_host"]: (r["n_links"], r["n_docs"], r["anchor_chars"])
           for r in html_outlinks(docs).collect()}
    # docs 1+3 link words at positions 2/5/8: beta, epsilon, theta;
    # anchor is "<word> page" (len(word) + 5)
    assert got["beta.example"] == (2, 2, 2 * 9)
    assert got["epsilon.example"] == (2, 2, 2 * 12)
    assert got["theta.example"] == (2, 2, 2 * 10)
    # doc 2 has two words -> every pick clamps to "two"
    assert got["two.example"] == (3, 1, 3 * 8)
    # hub chrome: nav "Hub home" (8) + footer "Terms of use" (12)
    assert got["hub.example"] == (6, 3, 3 * 20)
    assert set(got) == {"beta.example", "epsilon.example",
                        "theta.example", "two.example", "hub.example"}
