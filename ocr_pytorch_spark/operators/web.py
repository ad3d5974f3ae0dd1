"""Web-corpus hygiene operators: PII redaction and URL/domain
blocklist filtering.

Both are staples of a training-data pipeline (C4/CCNet/RefinedWeb all
apply URL filtering; PII scrubbing is a compliance requirement before
any corpus ships).  The corpus tables carry plain text, so — like
``operators/html.py`` — each operator works on a deterministic
rendering of the structured input derived from the row itself (same
expression in the DuckDB oracle), which keeps every step
hash-checkable cross-engine while exercising the real logic:

* ``pii_wrap``      — deterministic PII-bearing text per document
  (1-2 emails, an optional phone, an optional IPv4, keyed off
  ``doc_id`` so counts vary across rows).
* ``pii_redact``    — regex redaction (<EMAIL>/<PHONE>/<IP>) plus
  per-kind match counts.  Pure codegen ``regexp_replace`` /
  ``regexp_extract_all`` chains — no UDF, no shuffle: at 10^12 rows
  this is a map-only pass that AQE never touches.
* ``url_wrap``      — deterministic URL per document
  (``https://{source}-{doc_id%4}.example.{tld(lang)}/p/{doc_id}``).
* ``url_host_filter`` — host extraction, registrable-domain parse,
  broadcast anti-join against a host blocklist, per-host rollup.
  The blocklist is the broadcast side (real blocklists are ~10^5
  rows — always broadcastable); the only shuffle is the final
  per-host aggregate, map-side combined.

Every regex is in the common Java-regex/RE2 subset so Spark and
DuckDB agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# --- shared regexes (verbatim in the SQL oracle) ---
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"
IP_RE = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"
HOST_RE = "^https://([^/]+)"
DOMAIN_RE = "([^.]+\\.[^.]+)$"

# default host blocklist for url_host_filter (hosts that never exist at
# a given SF simply match nothing)
BLOCKLIST = [
    "src0-0.example.fr", "src1-2.example.com", "src3-0.example.de",
    "src4-3.example.es", "src5-1.example.com", "src7-1.example.cn",
    "src12-2.example.com",
]

_TLD_CASE = ("CASE lang WHEN 'de' THEN 'de' WHEN 'fr' THEN 'fr' "
             "WHEN 'es' THEN 'es' WHEN 'zh' THEN 'cn' "
             "ELSE 'com' END")


def pii_wrap(documents: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, raw): deterministic PII-bearing
    text.  Always one email; a second email when doc_id%2=1; a phone
    when doc_id%3>0; an IPv4 when doc_id%5>0."""
    did = F.col("doc_id").cast("string")
    email1 = F.concat(F.lit(" contact user"), did,
                      F.lit("@mail.example.com"))
    email2 = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(F.lit(" cc user"), did,
                 F.lit(".backup@example.org"))).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 3 > 0,
        F.concat(F.lit(" call 555-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"),
                        4, "0"))).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 5 > 0,
        F.concat(F.lit(" node 10."),
                 (F.col("doc_id") % 200).cast("string"), F.lit("."),
                 ((F.col("doc_id") * 3) % 250).cast("string"),
                 F.lit("."),
                 ((F.col("doc_id") * 7) % 250).cast("string"))
    ).otherwise(F.lit(""))
    raw = F.concat(F.substring("text", 1, 40), email1, email2, phone,
                   ip, F.lit(" end"))
    return documents.select("doc_id", raw.alias("raw"))


# the same synthesis as a DuckDB CTE body (f-string-safe: no braces)
PII_WRAP_SQL = """
  SELECT doc_id,
         substr(text, 1, 40)
         || ' contact user' || CAST(doc_id AS VARCHAR)
            || '@mail.example.com'
         || CASE WHEN doc_id % 2 = 1
                 THEN ' cc user' || CAST(doc_id AS VARCHAR)
                      || '.backup@example.org' ELSE '' END
         || CASE WHEN doc_id % 3 > 0
                 THEN ' call 555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 5 > 0
                 THEN ' node 10.' || CAST(doc_id % 200 AS VARCHAR)
                      || '.' || CAST((doc_id * 3) % 250 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 250 AS VARCHAR)
                 ELSE '' END
         || ' end' AS raw
  FROM documents
"""


def redact_expr(col):
    """The scrub itself (email -> phone -> ip, in order), applicable
    to any text column — shared by the oracle-checked query and the
    job-side stage."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IP_RE, "<IP>")


def redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Job-side PII scrub of a real text column (no synthesis)."""
    return documents.withColumn(text_col, redact_expr(F.col(text_col)))


def pii_redact(documents: DataFrame) -> DataFrame:
    """Redact emails/phones/IPv4s and count each kind.
    Output: doc_id, redacted, n_email, n_phone, n_ip (all BIGINT).

    Counts run on the raw text (independent per kind); redaction
    applies email -> phone -> ip in order.  Everything is JVM-side
    codegen — at corpus scale this fuses into the scan stage."""
    raw = pii_wrap(documents)

    def n(pat):
        return F.size(
            F.regexp_extract_all(F.col("raw"), F.lit(pat), 0)
        ).cast("long")

    return raw.select(
        "doc_id", redact_expr(F.col("raw")).alias("redacted"),
        n(EMAIL_RE).alias("n_email"), n(PHONE_RE).alias("n_phone"),
        n(IP_RE).alias("n_ip"))


def url_wrap(documents: DataFrame) -> DataFrame:
    """(doc_id, source, lang, n_chars) -> (doc_id, n_chars, url)."""
    tld = F.expr(_TLD_CASE)
    host = F.concat(F.col("source"), F.lit("-"),
                    (F.col("doc_id") % 4).cast("string"),
                    F.lit(".example."), tld)
    url = F.concat(F.lit("https://"), host, F.lit("/p/"),
                   F.col("doc_id").cast("string"), F.lit("?ref="),
                   F.col("lang"))
    return documents.select("doc_id", "n_chars", url.alias("url"))


URL_WRAP_SQL = f"""
  SELECT doc_id, n_chars,
         'https://' || source || '-' || CAST(doc_id % 4 AS VARCHAR)
         || '.example.' || {_TLD_CASE} || '/p/'
         || CAST(doc_id AS VARCHAR) || '?ref=' || lang AS url
  FROM documents
"""


def url_host_filter(documents: DataFrame,
                    blocklist: list[str] | None = None) -> DataFrame:
    """Parse host + registrable domain from each document URL, drop
    blocklisted hosts via a broadcast anti-join, roll up per host.
    Output: host, domain, n_docs, total_chars, first_doc.

    Scale shape: the blocklist broadcasts (anti-join never shuffles
    the corpus); host parsing is map-side regex; the rollup is the
    one shuffle, with map-side partial aggregation on a key space
    bounded by the number of distinct hosts."""
    spark = documents.sparkSession
    hosts = spark.createDataFrame(
        [(h,) for h in (blocklist or BLOCKLIST)], "host string")
    urls = url_wrap(documents)
    parsed = urls.select(
        "doc_id", "n_chars",
        F.regexp_extract("url", HOST_RE, 1).alias("host"))
    kept = parsed.join(F.broadcast(hosts), "host", "left_anti")
    return (kept
            .withColumn("domain",
                        F.regexp_extract("host", DOMAIN_RE, 1))
            .groupBy("host", "domain")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("doc_id").alias("first_doc")))


# --- URL canonicalization + canonical-URL dedup (r6) --------------------
#
# RefinedWeb / CCNet dedupe crawl snapshots on the NORMALIZED URL before
# any content-level pass: the same page is fetched under scheme/host
# case variants, default ports, tracking query params, fragments,
# duplicate slashes and /index.html suffixes.  ``url_messy_wrap``
# renders four deterministic messy variants per canonical target
# (keyed off doc_id, same expression in the DuckDB oracle) and
# ``url_canonical_dedup`` collapses them: canonicalize (pure codegen
# string/regex chain — map-only, fuses into the scan at corpus scale),
# then one hash-partitioned rollup on the canonical URL with map-side
# partial aggregation.  Keeper choice is min(doc_id) — deterministic,
# order-independent.  Every regex below is in the common
# Java-regex/RE2 subset (no backreferences, no replacement groups) so
# Spark and DuckDB agree byte-for-byte.

# canonicalization patterns (verbatim in the SQL oracle)
URL_FRAG_RE = "#.*$"                 # strip fragment
URL_PREFIX_RE = "^[^/]*//[^/]*"      # scheme://host[:port] prefix
URL_TRACK_RE = "[?]utm_[^#]*$"       # all-tracking query string
URL_INDEX_RE = "/index[.]html$"      # directory-default suffix
URL_DUPSLASH_RE = "//+"              # path duplicate slashes
URL_TRAIL_RE = "/$"                  # trailing slash


def url_messy_wrap(documents: DataFrame) -> DataFrame:
    """(doc_id, source, n_chars) -> (doc_id, n_chars, url): four messy
    variants (doc_id % 4) of one canonical target (doc_id // 4)."""
    grp_n = F.floor(F.col("doc_id") / 4).cast("long")
    grp = grp_n.cast("string")
    host = F.concat(F.lit("www.example-"), (grp_n % 8).cast("string"),
                    F.lit(".com"))
    path = F.concat(F.lit("/articles/"), grp)
    v = F.col("doc_id") % 4
    url = (F.when(v == 0, F.concat(F.lit("https://"), host, path))
            .when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(host),
                                   F.lit(":443"), path, F.lit("/")))
            .when(v == 2, F.concat(
                F.lit("https://"), host, path,
                F.lit("?utm_source=feed&utm_medium=rss")))
            .otherwise(F.concat(F.lit("https://"), host, F.lit("/"),
                                path, F.lit("/index.html#sec-2"))))
    return documents.select("doc_id", "n_chars", url.alias("url"))


URL_MESSY_WRAP_SQL = """
  WITH g AS (
    SELECT doc_id, n_chars,
           CAST(CAST(floor(doc_id / 4) AS BIGINT) AS VARCHAR) AS grp,
           'www.example-'
             || CAST(CAST(floor(doc_id / 4) AS BIGINT) % 8 AS VARCHAR)
             || '.com' AS host
    FROM documents
  )
  SELECT doc_id, n_chars,
         CASE doc_id % 4
           WHEN 0 THEN 'https://' || host || '/articles/' || grp
           WHEN 1 THEN 'HTTPS://' || upper(host) || ':443'
                       || '/articles/' || grp || '/'
           WHEN 2 THEN 'https://' || host || '/articles/' || grp
                       || '?utm_source=feed&utm_medium=rss'
           ELSE 'https://' || host || '//articles/' || grp
                || '/index.html#sec-2'
         END AS url
  FROM g
"""


def canonical_url_expr(col):
    """Canonical form of a messy URL: drop fragment, lowercase the
    scheme://host[:port] prefix, strip the default :443 port, drop an
    all-tracking query string, strip /index.html, collapse duplicate
    path slashes, strip the trailing slash.  Chain of 7 map-only
    string ops — whole-stage codegen, no UDF."""
    c = F.regexp_replace(col, URL_FRAG_RE, "")
    c = F.concat(F.lower(F.regexp_extract(c, f"({URL_PREFIX_RE})", 1)),
                 F.regexp_replace(c, URL_PREFIX_RE, ""))
    c = F.replace(c, F.lit(":443/"), F.lit("/"))
    c = F.regexp_replace(c, URL_TRACK_RE, "")
    c = F.regexp_replace(c, URL_INDEX_RE, "")
    c = F.concat(F.lit("https://"),
                 F.regexp_replace(F.substr(c, F.lit(9)),
                                  URL_DUPSLASH_RE, "/"))
    return F.regexp_replace(c, URL_TRAIL_RE, "")


def url_canonical_dedup(documents: DataFrame) -> DataFrame:
    """Collapse messy URL variants onto their canonical URL.
    Output: (canonical_url, keeper_doc, n_variants, total_chars).

    Scale shape: canonicalization is a map-only expression chain fused
    into the scan; the rollup is the single shuffle, keyed on the
    canonical URL (key space = number of distinct pages, uniform by
    construction of the hash — a crawl's per-site skew is the
    ``skew_profile`` -> ``salted_join`` path, not this one), with
    map-side partial aggregation collapsing the variant fan-in before
    the exchange."""
    urls = url_messy_wrap(documents)
    canon = urls.withColumn("canonical_url",
                            canonical_url_expr(F.col("url")))
    return (canon.groupBy("canonical_url")
            .agg(F.count("*").alias("n_variants"),
                 F.min("doc_id").alias("keeper_doc"),
                 F.sum("n_chars").cast("long").alias("total_chars")))


def domain_doc_cap(documents: DataFrame, key: str = "source",
                   k: int = 10, n_salts: int = 4) -> DataFrame:
    """Per-domain document cap: keep at most ``k`` documents per
    ``key`` (domain), preferring longer documents, ``doc_id`` as the
    deterministic tiebreak.  RefinedWeb and C4 both cap pages per
    registrable domain so a single template-heavy site cannot dominate
    the corpus; this is that pass.  Output:
    ``(source, doc_id, n_chars, rank)`` with ``rank`` in ``1..k``.

    Scale shape — salted two-phase top-k.  A naive
    ``row_number() OVER (PARTITION BY domain ...)`` sends EVERY row of
    a domain to one reducer; at crawl scale a hot domain (10^8 pages
    behind one key) is a straggler-and-OOM magnet that salting joins
    (``salted_join``) fixes for joins but not for windows.  Phase 1
    ranks within ``(key, salt)`` — the hot key spreads over
    ``n_salts`` reducers, each keeping only its local top-k.  Because
    the ordering ``(n_chars DESC, doc_id ASC)`` is a total order, a
    row in the global top-k of its domain is outranked by < k rows
    overall, hence by < k rows inside its own salt bucket — so the
    global top-k is a subset of the union of salt-local top-k's, and
    phase 1 is lossless.  Phase 2 re-ranks the <= n_salts*k survivors
    per key: that exchange carries O(domains * n_salts * k) rows, not
    the corpus.  Both phases are whole-stage-codegen windows; the
    salt column is ``xxhash64(doc_id)`` so re-execution of a lost
    partition reproduces identical buckets (no
    ``spark_partition_id``/``rand`` nondeterminism).
    """
    from pyspark.sql.window import Window

    order = [F.desc("n_chars"), F.asc("doc_id")]
    w1 = Window.partitionBy(key, "salt").orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    pruned = (documents
              .select(key, "doc_id", "n_chars",
                      F.pmod(F.xxhash64("doc_id"),
                             F.lit(n_salts)).alias("salt"))
              .withColumn("rn1", F.row_number().over(w1))
              .filter(F.col("rn1") <= k))
    return (pruned
            .withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k)
            .select(key, "doc_id", "n_chars", "rank"))


# --- robots.txt politeness filter (r7) -------------------------------------

def _md5_int8_w(col):
    """8-hex-digit md5 prefix as bigint (portable: DuckDB replays it
    with the instr digit chain)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def robots_filter(documents: DataFrame) -> DataFrame:
    """robots.txt politeness filter with the REP longest-match rule
    (RFC 9309: the most specific matching rule wins, so an Allow that
    is a longer prefix overrides a shorter Disallow).  The crawl-side
    gate that runs before fetching/ingesting a page at all.  Hosts and
    paths come from the same deterministic URL fabric the
    url_canonical_dedup key uses; each host's rule set derives from
    the host name (md5), so the key is input-driven at every scale
    factor:

      * hosts with even md5: ``Disallow: /articles/`` plus
        ``Allow: /articles/<k>`` where k = md5(host) %% 7 — pages
        whose path starts with the longer Allow prefix survive
        (literal prefix semantics, exactly as REP matches them: the
        Allow for ``/articles/1`` also covers ``/articles/12``);
      * hosts with odd md5: no rules — everything allowed.

    Pure whole-stage-codegen string/CASE logic, map-only (the 100 TB
    shape: this filter fuses into the URL scan and drops rows before
    any fetch or shuffle happens).
    Output: doc_id, host, path, blocked, rule."""
    grp_n = F.floor(F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("www.example-"), (grp_n % 8).cast("string"),
                    F.lit(".com"))
    path = F.concat(F.lit("/articles/"), grp_n.cast("string"))
    h = _md5_int8_w(host)
    has_rules = (h % 2) == 0
    allow_prefix = F.concat(F.lit("/articles/"),
                            (h % 7).cast("string"))
    rule = (F.when(~has_rules, F.lit("default"))
            .when(path.startswith(allow_prefix),
                  F.concat(F.lit("allow:"), allow_prefix))
            .otherwise(F.lit("disallow:/articles/")))
    blocked = has_rules & ~path.startswith(allow_prefix)
    return documents.select(
        "doc_id", host.alias("host"), path.alias("path"),
        blocked.alias("blocked"), rule.alias("rule"))


def robots_filter_oracle_sql() -> str:
    """DuckDB oracle for robots_filter — same host/path fabric, same
    md5 rule derivation, same longest-match CASE."""
    h = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(host), {i + 1}, 1))"
        f" - 1) * {16 ** (7 - i)}" for i in range(8))
    return f"""
        WITH g AS (
          SELECT doc_id,
                 'www.example-'
                   || CAST(CAST(floor(doc_id / 4) AS BIGINT) % 8
                           AS VARCHAR) || '.com' AS host,
                 '/articles/'
                   || CAST(CAST(floor(doc_id / 4) AS BIGINT)
                           AS VARCHAR) AS path
          FROM documents
        ), rules AS (
          SELECT doc_id, host, path, ({h}) AS hh FROM g
        )
        SELECT doc_id, host, path,
               (hh % 2 = 0 AND NOT starts_with(path,
                  '/articles/' || CAST(hh % 7 AS VARCHAR)))
                 AS blocked,
               CASE WHEN hh % 2 <> 0 THEN 'default'
                    WHEN starts_with(path,
                         '/articles/' || CAST(hh % 7 AS VARCHAR))
                      THEN 'allow:/articles/'
                           || CAST(hh % 7 AS VARCHAR)
                    ELSE 'disallow:/articles/' END AS rule
        FROM rules"""


# --- RFC 9309 robots.txt parser + matcher (r8) ------------------------
#
# r7 VERDICT task 3: robots_filter above demonstrates the longest-
# match GATE shape but synthesizes its rules from md5(host).  A real
# crawl pipeline parses fetched (host, robots_txt) blobs FIRST:
#   parse -> (host, grp, agent, rule) table -> broadcast-join the URL
#   stream -> longest-match verdict, with RFC 9309 section 2.2.2
#   `*` / `$` wildcard support.

_ROBOTS_FIELDS = ("user-agent", "allow", "disallow")


def robots_parse(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """Parse a (host, robots_txt) table into per-rule rows with
    RFC 9309 section 2.2 group structure:

      * lines are ``field: value`` records; ``#`` starts a comment;
        unknown fields (sitemap, crawl-delay, ...) and blank lines
        are skipped (2.2.4);
      * a ``user-agent`` line starts a new GROUP unless the previous
        valid line was also ``user-agent`` — consecutive UA lines
        share one group (2.2.1);
      * ``allow`` / ``disallow`` lines attach to the current group;
        rules before any group are invalid and dropped;
      * field names and agent product tokens are case-insensitive
        (lowercased); rule VALUES — path patterns, incl. ``*``/``$``
        wildcards (2.2.2) — keep their case: matching happens in
        :func:`robots_match`.

    Output: (host, grp, agent, rule_idx, pattern, is_allow) — one row
    per (agent x rule) within a group; ``rule_idx`` is the 1-based
    line number (the stable tiebreak for longest-match precedence).

    Scale shape: robots.txt blobs are tiny and one-per-host, so the
    per-host window orders a few dozen lines over an ~|hosts|-row
    table — one narrow shuffle on host; the parsed output is the
    BROADCAST side of robots_match's join against the URL stream."""
    from pyspark.sql.window import Window

    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\r?\n"))
        .alias("pos", "raw"))
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*", ""))
    field = F.lower(F.regexp_extract(clean, r"^([A-Za-z\-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(clean, r"^[A-Za-z\-]+\s*:(.*)$", 1))
    df = (lines
          .select("host", (F.col("pos") + 1).alias("line_no"),
                  field.alias("field"), value.alias("value"))
          .where(F.col("field").isin(*_ROBOTS_FIELDS)))
    w = Window.partitionBy("host").orderBy("line_no")
    is_ua = F.col("field") == "user-agent"
    new_grp = is_ua & (F.coalesce(F.lag("field").over(w),
                                  F.lit("")) != "user-agent")
    df = df.withColumn("grp", F.sum(new_grp.cast("long")).over(w))
    agents = (df.where(is_ua)
              .select("host", "grp",
                      F.lower(F.col("value")).alias("agent")))
    rules = (df.where(~is_ua)
             .select("host", "grp",
                     F.col("line_no").cast("long").alias("rule_idx"),
                     F.col("value").alias("pattern"),
                     (F.col("field") == "allow").alias("is_allow")))
    return (agents.join(rules, ["host", "grp"])
            .select("host", "grp", "agent", "rule_idx", "pattern",
                    "is_allow"))


def _with_pattern_re(rules: DataFrame) -> DataFrame:
    """Add ``pattern_re``: the RFC 9309 2.2.2 pattern compiled to an
    anchored regex — ``*`` matches any char sequence, a TRAILING
    ``$`` anchors the end, every other char (incl. mid-pattern ``$``)
    is literal.  Applied only to the tiny parsed-rules table."""
    anchored = F.col("pattern").endswith("$")
    core = F.when(anchored,
                  F.substring(F.col("pattern"), F.lit(1),
                              F.length("pattern") - 1)) \
            .otherwise(F.col("pattern"))
    esc = F.regexp_replace(
        core, r"([\\.\+\?\(\)\[\]\{\}\|\^\$])", r"\\$1")
    rex = F.regexp_replace(esc, r"\*", ".*")
    return rules.withColumn(
        "pattern_re",
        F.concat(F.lit("^"), rex,
                 F.when(anchored, F.lit("$")).otherwise(F.lit(""))))


def robots_match(urls: DataFrame, parsed: DataFrame,
                 agent: str = "*") -> DataFrame:
    """Gate a URL stream (doc_id, host, path) against
    :func:`robots_parse` output for one crawler ``agent``:

      * group selection (RFC 9309 2.2.1): if a host has any group
        naming this agent, ONLY those groups apply; otherwise its
        ``*`` groups do;
      * precedence (2.2.2): among matching rules the longest raw
        pattern wins, Allow wins length ties, lowest line number
        breaks exact ties; empty patterns match nothing; no matching
        rule -> allowed.

    Scale shape: the per-agent rule tier is O(hosts x rules) — tiny
    vs the URL stream — so it is F.broadcast()'d and the match is a
    map-side stage fused into the URL scan; the winner-per-URL is a
    groupBy max_by whose map-side partial agg collapses each URL's
    handful of candidate rules before the exchange, so the shuffle
    is exactly |urls| skinny verdict rows.
    Output: (doc_id, host, path, blocked, rule_pattern, rule_kind)
    — rule_pattern is NULL and rule_kind ('allow'/'disallow') is NULL
    when no rule matched (string, not nullable-boolean: a NULL
    boolean round-trips as NaN through Arrow/pandas and breaks the
    driver's value hash)."""
    a = agent.lower()
    spec = (parsed.groupBy("host")
            .agg(F.max(F.when(F.col("agent") == a, 1).otherwise(0))
                 .alias("has_spec")))
    tier = (parsed.join(spec, "host")
            .where(((F.col("has_spec") == 1)
                    & (F.col("agent") == a))
                   | ((F.col("has_spec") == 0)
                      & (F.col("agent") == "*")))
            .where(F.length("pattern") > 0))
    rules = _with_pattern_re(tier).select(
        "host", "rule_idx", "pattern", "pattern_re", "is_allow")
    j = urls.join(F.broadcast(rules), "host", "left")
    hit = F.when(F.col("pattern_re").isNull(), F.lit(False)) \
           .otherwise(F.expr("path rlike pattern_re"))
    scored = j.withColumn("hit", hit)
    rank = F.struct(
        F.col("hit").cast("int"),
        F.coalesce(F.length("pattern"), F.lit(-1)),
        F.coalesce(F.col("is_allow").cast("int"), F.lit(-1)),
        F.coalesce(-F.col("rule_idx"), F.lit(0)))
    win = F.max_by(
        F.struct(F.col("hit"),
                 F.col("pattern").alias("rule_pattern"),
                 F.col("is_allow").alias("rule_is_allow")),
        rank).alias("w")
    return (scored.groupBy("doc_id", "host", "path").agg(win)
            .select("doc_id", "host", "path",
                    F.coalesce(F.col("w.hit")
                               & ~F.col("w.rule_is_allow"),
                               F.lit(False)).alias("blocked"),
                    F.when(F.col("w.hit"), F.col("w.rule_pattern"))
                    .alias("rule_pattern"),
                    F.when(F.col("w.hit"),
                           F.when(F.col("w.rule_is_allow"),
                                  F.lit("allow"))
                           .otherwise(F.lit("disallow")))
                    .alias("rule_kind")))


def robots_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic (host, robots_txt) fabric for the driver keys —
    the same 8-host fabric robots_filter uses, each host's blob
    derived from md5(host) so the parse input is input-driven:
    comments, a dangling pre-group rule, mixed-case field names, an
    empty Disallow, ``*``/``$`` wildcard rules, and (even-md5 hosts
    only) a second multi-agent group with a derived agent token."""
    grp_n = F.floor(F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("www.example-"),
                    (grp_n % 8).cast("string"), F.lit(".com"))
    hosts = documents.select(host.alias("host")).distinct()
    h = _md5_int8_w(F.col("host"))
    base = F.concat_ws(
        "\n",
        F.concat(F.lit("# robots for "), F.col("host")),
        F.lit("Disallow: /orphan/"),      # before any group: dropped
        F.lit(""),
        F.lit("User-Agent: *"),           # mixed-case field name
        F.lit("Disallow: /private/"),
        F.lit("Allow: /private/pub*"),    # * wildcard
        F.lit("Disallow: /tmp/*.html$"),  # wildcard + end anchor
        F.lit("Disallow:"))               # empty: matches nothing
    grp2 = F.concat_ws(
        "\n",
        F.lit(""),
        F.concat(F.lit("User-agent: bot-"), (h % 3).cast("string")),
        F.lit("User-agent: ccbot"),       # multi-UA group
        F.lit("Disallow: /"),
        # * AND $ in one rule, and it actually FIRES on the URL
        # fabric: articles whose number ends in the derived digit
        F.concat(F.lit("Allow: /articles/*"), (h % 10).cast("string"),
                 F.lit("$")))
    txt = (F.when((h % 2) == 0, F.concat(base, F.lit("\n"), grp2))
           .otherwise(base))
    return hosts.select("host", txt.alias("robots_txt"))


def robots_urls(documents: DataFrame) -> DataFrame:
    """Deterministic URL stream (doc_id, host, path) over the same
    host fabric, with path shapes that exercise every wildcard rule
    in :func:`robots_corpus`."""
    grp_n = F.floor(F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("www.example-"),
                    (grp_n % 8).cast("string"), F.lit(".com"))
    g = grp_n.cast("string")
    m = F.col("doc_id") % 4
    path = (F.when(m == 0, F.concat(F.lit("/articles/"), g))
            .when(m == 1, F.concat(F.lit("/private/pub"), g))
            .when(m == 2, F.concat(F.lit("/tmp/page"), g,
                                   F.lit(".html")))
            .otherwise(F.lit("/private/secret")))
    return documents.select("doc_id", host.alias("host"),
                            path.alias("path"))


def _robots_fabric_sql() -> str:
    """DuckDB replica of robots_corpus() — same host fabric, same
    md5-derived blob."""
    h = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(host), {i + 1}, 1))"
        f" - 1) * {16 ** (7 - i)}" for i in range(8))
    return f"""
        WITH hosts AS (
          SELECT DISTINCT
            'www.example-'
              || CAST(CAST(floor(doc_id / 4) AS BIGINT) % 8
                      AS VARCHAR) || '.com' AS host
          FROM documents
        ), hh AS (SELECT host, ({h}) AS h FROM hosts)
        SELECT host,
          '# robots for ' || host || chr(10)
          || 'Disallow: /orphan/' || chr(10) || chr(10)
          || 'User-Agent: *' || chr(10)
          || 'Disallow: /private/' || chr(10)
          || 'Allow: /private/pub*' || chr(10)
          || 'Disallow: /tmp/*.html$' || chr(10)
          || 'Disallow:'
          || CASE WHEN h % 2 = 0 THEN chr(10) || chr(10)
               || 'User-agent: bot-' || CAST(h % 3 AS VARCHAR)
               || chr(10) || 'User-agent: ccbot' || chr(10)
               || 'Disallow: /' || chr(10)
               || 'Allow: /articles/*' || CAST(h % 10 AS VARCHAR)
               || '$'
             ELSE '' END AS robots_txt
        FROM hh"""


def _robots_parse_body_sql() -> str:
    """The parse pipeline as chained CTE bodies (shared by both
    oracle queries) — identical line/field/group semantics to
    robots_parse()."""
    return rf"""
        lines AS (
          SELECT host,
                 generate_subscripts(string_split_regex(robots_txt,
                     chr(13) || '?' || chr(10)), 1) AS line_no,
                 unnest(string_split_regex(robots_txt,
                     chr(13) || '?' || chr(10))) AS raw
          FROM rt
        ), fields AS (
          SELECT host, line_no,
            lower(regexp_extract(trim(regexp_replace(raw, '#.*', '',
                'g')), '^([A-Za-z\-]+)\s*:', 1)) AS field,
            trim(regexp_extract(trim(regexp_replace(raw, '#.*', '',
                'g')), '^[A-Za-z\-]+\s*:(.*)$', 1)) AS value
          FROM lines
        ), valid AS (
          SELECT * FROM fields
          WHERE field IN ('user-agent', 'allow', 'disallow')
        ), marks AS (
          SELECT *, CASE WHEN field = 'user-agent'
                     AND coalesce(lag(field) OVER (PARTITION BY host
                         ORDER BY line_no), '') <> 'user-agent'
                     THEN 1 ELSE 0 END AS ng
          FROM valid
        ), grps AS (
          SELECT *, CAST(sum(ng) OVER (PARTITION BY host
                         ORDER BY line_no) AS BIGINT) AS grp
          FROM marks
        ), agents AS (
          SELECT host, grp, lower(value) AS agent
          FROM grps WHERE field = 'user-agent'
        ), rrules AS (
          SELECT host, grp, CAST(line_no AS BIGINT) AS rule_idx,
                 value AS pattern, field = 'allow' AS is_allow
          FROM grps WHERE field <> 'user-agent'
        ), parsed AS (
          SELECT a.host, a.grp, a.agent, r.rule_idx, r.pattern,
                 r.is_allow
          FROM agents a JOIN rrules r USING (host, grp)
        )"""


def robots_parse_oracle_sql() -> str:
    """DuckDB oracle for the robots_parse driver key."""
    return (f"WITH rt AS ({_robots_fabric_sql()}),"
            f"{_robots_parse_body_sql()} "
            "SELECT host, grp, agent, rule_idx, pattern, is_allow "
            "FROM parsed")


def robots_match_oracle_sql(agent: str = "ccbot") -> str:
    """DuckDB oracle for the robots_match driver key — same group
    selection, wildcard compilation, and longest-match precedence."""
    return rf"""
        WITH rt AS ({_robots_fabric_sql()}),
        {_robots_parse_body_sql()},
        urls AS (
          SELECT doc_id,
            'www.example-'
              || CAST(CAST(floor(doc_id / 4) AS BIGINT) % 8
                      AS VARCHAR) || '.com' AS host,
            CASE CAST(doc_id % 4 AS BIGINT)
              WHEN 0 THEN '/articles/'
                || CAST(CAST(floor(doc_id / 4) AS BIGINT) AS VARCHAR)
              WHEN 1 THEN '/private/pub'
                || CAST(CAST(floor(doc_id / 4) AS BIGINT) AS VARCHAR)
              WHEN 2 THEN '/tmp/page'
                || CAST(CAST(floor(doc_id / 4) AS BIGINT) AS VARCHAR)
                || '.html'
              ELSE '/private/secret' END AS path
          FROM documents
        ), spec AS (
          SELECT host,
                 max(CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END)
                   AS has_spec
          FROM parsed GROUP BY host
        ), tier AS (
          SELECT p.* FROM parsed p JOIN spec s USING (host)
          WHERE ((s.has_spec = 1 AND p.agent = '{agent}')
                 OR (s.has_spec = 0 AND p.agent = '*'))
            AND length(p.pattern) > 0
        ), rex AS (
          SELECT host, rule_idx, pattern, is_allow,
            '^' || replace(regexp_replace(
                CASE WHEN pattern LIKE '%$'
                     THEN substr(pattern, 1, length(pattern) - 1)
                     ELSE pattern END,
                '([\\.\+\?\(\)\[\]\{{\}}\|\^\$])', '\\\1', 'g'),
                '*', '.*')
              || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END
              AS pattern_re
          FROM tier
        ), joined AS (
          SELECT u.doc_id, u.host, u.path, r.rule_idx, r.pattern,
                 r.is_allow,
                 coalesce(regexp_matches(u.path, r.pattern_re),
                          FALSE) AS hit
          FROM urls u LEFT JOIN rex r USING (host)
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY hit DESC,
                     coalesce(length(pattern), -1) DESC,
                     coalesce(CAST(is_allow AS INT), -1) DESC,
                     coalesce(rule_idx, 0) ASC) AS rn
          FROM joined
        )
        SELECT doc_id, host, path,
               coalesce(hit AND NOT is_allow, FALSE) AS blocked,
               CASE WHEN hit THEN pattern END AS rule_pattern,
               CASE WHEN hit THEN (CASE WHEN is_allow THEN 'allow'
                                   ELSE 'disallow' END)
               END AS rule_kind
        FROM ranked WHERE rn = 1"""


# --- sitemap ingestion (r8) -------------------------------------------
#
# The second crawl control surface next to robots.txt: a fetched
# (host, sitemap_xml) table is parsed into per-URL rows that seed the
# frontier.  Parsing is pure map-side string work (regexp over the
# tiny per-host blob), so the plan is one narrow projection fused
# into the sitemap scan — at 10^9 hosts this is an embarrassingly
# parallel pass with zero shuffles before the frontier join.

def sitemap_parse(sitemaps: DataFrame, host_col: str = "host",
                  xml_col: str = "sitemap_xml") -> DataFrame:
    """Parse sitemap XML blobs into (host, pos, url, lastmod) rows —
    one row per ``<url>`` block in document order (``pos`` is the
    1-based block index, the crawl-priority order sitemaps imply);
    ``lastmod`` is NULL when the block has none.  All five XML
    escapes (&amp; &lt; &gt; &quot; &apos;) are decoded in <loc>.

    Scale shape: blocks are extracted with one regexp_extract_all per
    blob and exploded — no shuffle; the output feeds robots_match /
    url_canonical_dedup / domain_doc_cap downstream."""
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<url>([\s\S]*?)</url>"), 1)
    df = (sitemaps
          .select(F.col(host_col).alias("host"),
                  F.posexplode(blocks).alias("pos0", "block")))
    loc = F.regexp_extract(F.col("block"),
                           r"<loc>\s*([\s\S]*?)\s*</loc>", 1)
    lastmod = F.regexp_extract(F.col("block"),
                               r"<lastmod>\s*([\s\S]*?)\s*</lastmod>", 1)
    # the five XML escapes sitemap <loc> values may carry — &amp;
    # decoded LAST so "&amp;lt;" round-trips as the literal "&lt;"
    url = loc
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return df.select(
        "host",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        url.alias("url"),
        F.when(lastmod == "", F.lit(None).cast("string"))
        .otherwise(lastmod).alias("lastmod"))


def sitemap_corpus(documents: DataFrame) -> DataFrame:
    """Deterministic (host, sitemap_xml) fabric over the robots host
    fabric: per host, 1 + md5(host)%4 url blocks; every odd block
    carries a lastmod date derived from the hash; block 2 (when
    present) exercises the &amp; escape."""
    grp_n = F.floor(F.col("doc_id") / 4).cast("long")
    host = F.concat(F.lit("www.example-"),
                    (grp_n % 8).cast("string"), F.lit(".com"))
    hosts = documents.select(host.alias("host")).distinct()
    h = _md5_int8_w(F.col("host"))
    n_blocks = (h % 4) + 1

    def block(i: int):
        url = F.concat(
            F.lit("https://"), F.col("host"), F.lit("/page-"),
            F.lit(str(i)),
            F.when(F.lit(i) == 2, F.lit("?a=1&amp;b=2"))
            .otherwise(F.lit("")))
        lastmod = F.concat(
            F.lit("<lastmod>2025-0"), ((h + i) % 9 + 1).cast("string"),
            F.lit("-15</lastmod>"))
        body = F.concat(F.lit("<url><loc> "), url, F.lit(" </loc>"),
                        F.when(F.lit(i % 2 == 1), lastmod)
                        .otherwise(F.lit("")),
                        F.lit("</url>"))
        return F.when(F.lit(i) <= n_blocks, body).otherwise(F.lit(""))

    xml = F.concat(
        F.lit('<urlset xmlns="http://www.sitemaps.org/schemas'
              '/sitemap/0.9">'),
        *[block(i) for i in range(1, 5)],
        F.lit("</urlset>"))
    return hosts.select("host", xml.alias("sitemap_xml"))


def sitemap_parse_oracle_sql() -> str:
    """DuckDB oracle for the sitemap_parse driver key — same fabric,
    same block regexes."""
    h = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(host), {i + 1}, 1))"
        f" - 1) * {16 ** (7 - i)}" for i in range(8))
    blocks = " || ".join(
        f"""CASE WHEN {i} <= n_blocks THEN
              '<url><loc> https://' || host || '/page-{i}'
              || CASE WHEN {i} = 2 THEN '?a=1&amp;b=2' ELSE '' END
              || ' </loc>'
              || CASE WHEN {i % 2} = 1 THEN
                   '<lastmod>2025-0'
                   || CAST((h + {i}) % 9 + 1 AS VARCHAR)
                   || '-15</lastmod>' ELSE '' END
              || '</url>'
            ELSE '' END""" for i in range(1, 5))
    return rf"""
        WITH hosts AS (
          SELECT DISTINCT
            'www.example-'
              || CAST(CAST(floor(doc_id / 4) AS BIGINT) % 8
                      AS VARCHAR) || '.com' AS host
          FROM documents
        ), hh AS (
          SELECT host, ({h}) AS h, (({h}) % 4) + 1 AS n_blocks
          FROM hosts
        ), sm AS (
          SELECT host,
                 '<urlset xmlns="http://www.sitemaps.org/schemas'
                 || '/sitemap/0.9">' || {blocks} || '</urlset>'
                   AS sitemap_xml
          FROM hh
        ), ex AS (
          SELECT host,
                 generate_subscripts(regexp_extract_all(sitemap_xml,
                     '<url>([\s\S]*?)</url>', 1), 1) AS pos,
                 unnest(regexp_extract_all(sitemap_xml,
                     '<url>([\s\S]*?)</url>', 1)) AS block
          FROM sm
        )
        SELECT host, CAST(pos AS BIGINT) AS pos,
               replace(replace(replace(replace(replace(
                   regexp_extract(block,
                       '<loc>\s*([\s\S]*?)\s*</loc>', 1),
                   '&lt;', '<'), '&gt;', '>'), '&quot;', chr(34)),
                   '&apos;', chr(39)), '&amp;', '&') AS url,
               CASE WHEN regexp_extract(block,
                   '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1) = ''
                    THEN NULL
                    ELSE regexp_extract(block,
                        '<lastmod>\s*([\s\S]*?)\s*</lastmod>', 1)
               END AS lastmod
        FROM ex"""
