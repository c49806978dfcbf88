package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Crawl
import Q._

/** Crawl front-end queries (SURVEY.md §2.7): HTML text extraction, URL
  * canonicalization + dedup, the Gopher composite quality gate, and
  * corpus-wide duplicated-line removal. The synthetic corpus carries no
  * HTML/URLs/line structure, so both engines CONSTRUCT the same
  * deterministic structure from `(doc_id, source, lang, text)` and then run
  * the operator — the extraction/normalization/dedup path is what's under
  * test, the multimodal/pii precedent. All construction constants are
  * shared between the Spark plan and the oracle SQL so the sides cannot
  * drift.
  */
object QueriesCrawl {

  // --- shared construction constants --------------------------------------

  // HTML wrapper: title carries an entity; script carries a raw '<' (must
  // not survive as a tag boundary); a comment and list markup surround the
  // body text; a second paragraph carries an entity-bearing tail.
  private val H1 = "<html><head><title>Doc "
  private val H2 = " &amp; "
  private val H3 = "</title><style>p{color:red}</style>" +
    "<script>var x = 1 < 2; send(x);</script></head><body><!-- nav -->\n<h1>"
  private val H4 = "</h1><p>"
  private val H5 = "</p>\n<ul><li>Home</li><li>Next &gt;</li></ul>\n<p>Lang: "
  private val H6 = "</p></body></html>"

  // URL: uppercase scheme/host + default port + trailing slash (on every
  // 4th doc) + tracking params + an occasional content param + fragment —
  // every normalization rule fires, and stripped variants collide.
  private val U1 = "HTTPS://"
  private val U2 = ".Example.COM:443/Docs/"
  private val U3 = "?utm_source=feed&ref="
  private val BlockedHosts = Seq("src3.example.com")

  // Gopher thresholds fitted so each rule discriminates on this corpus
  // (words 10-99, mean word length 3.7-5.3, stop presence 382/500).
  private val MinWords = 30L
  private val MaxWords = 100000L
  private val MinMeanLen = 4.0
  private val MaxMeanLen = 5.2
  private val MaxSymbolRatio = 0.1
  private val MinAlphaFrac = 0.8
  private val MinStops = 1

  // Link graph: every page links to 3 deterministic targets (integer maps
  // of doc_id modulo the corpus size; the quadratic and floor-division
  // maps are deliberately NON-bijective so host in-degree — and therefore
  // rank — varies). ONE list of SQL exprs serves both engines: DuckDB
  // verbatim, Spark via `//` → `div` (identical integer semantics for
  // non-negative operands). PageRank runs 5 rounds in integer micros.
  // The quadratic map reduces doc_id mod the corpus count BEFORE squaring
  // ((x % n)^2 ≡ x^2 (mod n) — value-identical, but overflow-free for any
  // n up to ~3e9): ScaleUp's disjoint-key-space ids reach ~1e10 at the
  // 1000x point, where the raw square exceeds Int64. `@N@` substitutes to
  // `nn.n` in the oracle and to the literal count in the Spark plan.
  private val LinkTargetExprs = Seq(
    "((doc_id % @N@) * (doc_id % @N@) + 1)", "(doc_id * 7 + 1)",
    "((doc_id // 3) * 5 + 2)")

  /** The Spark side of the shared link-target maps: `//` becomes integer
    * `div`, `@N@` becomes the literal corpus count, and each map reduces
    * modulo the count — one builder for the five crawl-graph heads.
    */
  private def linkTargets(n: Long) =
    array(LinkTargetExprs.map { e =>
      pmod(expr(e.replace("//", "div").replace("@N@", n.toString)), lit(n))
    }: _*)
  private val HostSuffix = ".example.com"
  private val PrIters = 5
  private val PrInit = 1000000L
  private val PrBase = 150000L
  private val PrDampNum = 85L
  private val PrDampDen = 100L
  // authority floor for curation_authority (ranks at sf0.01 span
  // ~0.21M-2.5M micros, so the floor discriminates)
  private val AuthorityFloor = 600000L
  // hits_authority: HITS rounds (each = one auth + one hub half-round)
  private val HitsIters = 2

  // Frontier scheduling: discovered targets with t % FetchedMod == 0 count
  // as already crawled; per-host politeness cap and global batch budget
  // both sized to BITE at sf0.01 (20 hosts x <=25 candidates: the cap
  // trims hosts, then the budget trims the capped ~160 down to 100).
  private val FrontierFetchedMod = 3
  private val FrontierHostCap = 8
  private val FrontierBudget = 100

  // Line construction: 8-token lines, a newsletter banner on every doc and
  // a rights footer on even docs — the corpus-frequent boilerplate the pass
  // must remove.
  private val LineTokens = 8
  private val Boiler1 = "subscribe to our newsletter"
  private val Boiler2 = "all rights reserved"
  private val LineMinFreq = 2L

  // --- oracle SQL ---------------------------------------------------------

  /** DuckDB twin of the [[Crawl.Entities]] decode fold ('' escapes '). */
  private def entitySql(inner: String): String =
    Crawl.Entities.foldLeft(inner) { case (acc, (ent, ch)) =>
      s"replace($acc, '$ent', '${ch.replace("'", "''")}')"
    }

  /** The deterministic HTML wrapper, as a SQL expression over `documents`
    * columns — shared by the extraction query and the config journeys.
    */
  private def htmlBuildSql: String =
    s"'$H1' || CAST(doc_id AS VARCHAR) || '$H2' || source || " +
      s"'$H3' || source || '$H4' || text || '$H5' || lang || '$H6'"

  /** The extraction chain over a column named `html` — the same ordered
    * chain as Crawl.htmlText: blocks out -> source whitespace flattened ->
    * block closes become newlines -> tags become spaces -> entities ->
    * space collapse / newline tidy / edge strip.
    */
  private def extractChainSql: String = {
    val noTags =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(html,
            '${Crawl.ScriptPattern}', ' ', 'g'),
            '${Crawl.StylePattern}', ' ', 'g'),
            '${Crawl.CommentPattern}', ' ', 'g'),
            '\\s+', ' ', 'g'),
            '${Crawl.BlockBreakPattern}', chr(10), 'g'),
            '${Crawl.TagPattern}', ' ', 'g')"""
    s"""trim(regexp_replace(regexp_replace(regexp_replace(
        ${entitySql(noTags)},
        '[ \\t]+', ' ', 'g'),
        '[ ]*\\n[\\n ]*', chr(10), 'g'),
        '^\\n+|\\n+$$', '', 'g'))"""
  }

  private def htmlExtractSql: String = {
    val tidied = extractChainSql
    s"""WITH h AS (SELECT doc_id, $htmlBuildSql AS html FROM documents),
        x AS (
          SELECT doc_id,
            trim(regexp_replace(${entitySql(
              s"regexp_extract(html, '${Crawl.TitlePattern}', 1)")},
              '\\s+', ' ', 'g')) AS title,
            $tidied AS text
          FROM h)
        SELECT doc_id, title, text,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_words
        FROM x"""
  }

  private def urlDedupSql: String = {
    val url = s"'$U1' || upper(source) || '$U2' || CAST(doc_id % 40 AS VARCHAR)" +
      s" || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)" +
      s" || '$U3' || CAST(doc_id % 5 AS VARCHAR)" +
      s" || (CASE WHEN doc_id % 3 = 0 THEN '&page=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)" +
      s" || '#sec' || CAST(doc_id % 4 AS VARCHAR)"
    s"""WITH u AS (SELECT doc_id, $url AS url FROM documents),
        p AS (
          SELECT doc_id,
            lower(regexp_extract(url, '${Crawl.SchemePattern}', 1)) AS scheme,
            regexp_replace(regexp_replace(url, '${Crawl.SchemePattern}', ''),
              '#.*$$', '') AS nofrag
          FROM u),
        q AS (
          SELECT doc_id, scheme,
            lower(regexp_extract(nofrag, '^([^/?#]+)', 1)) AS hostport,
            regexp_replace(nofrag, '^[^/?#]+', '') AS pq
          FROM p),
        r AS (
          SELECT doc_id, scheme,
            CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
                 WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
                 ELSE hostport END AS host,
            regexp_replace(regexp_extract(pq, '^([^?]*)', 1), '/+$$', '') AS path0,
            array_to_string(list_filter(
              string_split(regexp_extract(pq, '\\?(.*)$$', 1), '&'),
              x -> NOT regexp_matches(x, '${Crawl.TrackingParamPattern}')),
              '&') AS query
          FROM q),
        n AS (
          SELECT doc_id,
            scheme || '://' || host ||
            (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
            (CASE WHEN length(query) > 0 THEN '?' || query ELSE '' END)
              AS url_norm,
            host
          FROM r),
        f AS (
          SELECT doc_id, url_norm, host,
            host IN (${BlockedHosts.map(h => s"'$h'").mkString(", ")}) AS blocked,
            min(doc_id) OVER (PARTITION BY url_norm) AS canonical_id
          FROM n)
        SELECT doc_id, url_norm, host, blocked, canonical_id,
               (NOT blocked AND doc_id = canonical_id) AS keep
        FROM f"""
  }

  private def qualityGopherSql: String = {
    val stops = Crawl.GopherStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH w AS (
          SELECT doc_id, text,
                 regexp_split_to_array(text, '\\s+') AS w
          FROM documents),
        sig AS (
          SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
                  / GREATEST(len(w), 1), 6) AS mean_word_len,
            ROUND(CAST((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) / 3
                  AS DOUBLE) / GREATEST(len(w), 1), 6) AS symbol_ratio,
            ROUND(CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]')))
                  AS DOUBLE) / GREATEST(len(w), 1), 6) AS alpha_frac,
            CAST(len(list_intersect(list_distinct([lower(x) for x in w]),
                  $stops)) AS BIGINT) AS n_stops
          FROM w)
        SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
               n_stops,
               (n_words >= $MinWords AND n_words <= $MaxWords) AS keep_words,
               (mean_word_len >= $MinMeanLen AND mean_word_len <= $MaxMeanLen)
                 AS keep_mean_len,
               (symbol_ratio <= $MaxSymbolRatio) AS keep_symbol,
               (alpha_frac >= $MinAlphaFrac) AS keep_alpha,
               (n_stops >= $MinStops) AS keep_stops,
               (n_words >= $MinWords AND n_words <= $MaxWords
                AND mean_word_len >= $MinMeanLen AND mean_word_len <= $MaxMeanLen
                AND symbol_ratio <= $MaxSymbolRatio
                AND alpha_frac >= $MinAlphaFrac
                AND n_stops >= $MinStops) AS keep
        FROM sig"""
  }

  /** gate_agreement twin: the same two verdicts (quality-score threshold,
    * gopher composite keep) into the same 2×2 confusion and the same
    * Cohen's-kappa expression, term shapes mirrored.
    */
  private def gateAgreementSql: String =
    s"""WITH g AS ($qualityGopherSql),
        q AS (${QueriesLlm.qualityScoreSql("documents")}),
        v AS (
          SELECT q.quality >= 0.35 AS a, g.keep AS b
          FROM q JOIN g USING (doc_id)),
        c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_both,
                 CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality_only,
                 CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_gopher_only,
                 CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_neither
          FROM v)
        SELECT n, n_both, n_quality_only, n_gopher_only, n_neither,
               CASE WHEN 1.0 - (
                        (CAST(n_both + n_quality_only AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        * (CAST(n_both + n_gopher_only AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        + (1.0 - CAST(n_both + n_quality_only AS DOUBLE)
                             / CAST(n AS DOUBLE))
                        * (1.0 - CAST(n_both + n_gopher_only AS DOUBLE)
                             / CAST(n AS DOUBLE))) = 0 THEN 0.0
                    ELSE ROUND(
                      ((CAST(n_both + n_neither AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       - ((CAST(n_both + n_quality_only AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          * (CAST(n_both + n_gopher_only AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          + (1.0 - CAST(n_both + n_quality_only AS DOUBLE)
                               / CAST(n AS DOUBLE))
                          * (1.0 - CAST(n_both + n_gopher_only AS DOUBLE)
                               / CAST(n AS DOUBLE))))
                      / (1.0 - (
                          (CAST(n_both + n_quality_only AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          * (CAST(n_both + n_gopher_only AS DOUBLE)
                             / CAST(n AS DOUBLE))
                          + (1.0 - CAST(n_both + n_quality_only AS DOUBLE)
                               / CAST(n AS DOUBLE))
                          * (1.0 - CAST(n_both + n_gopher_only AS DOUBLE)
                               / CAST(n AS DOUBLE)))), 6)
               END AS kappa
        FROM c"""

  private def lineDedupSql: String = {
    import graft.functions.Text.portableHashSql
    s"""WITH w AS (
          SELECT doc_id, regexp_split_to_array(text, '\\s+') AS w
          FROM documents),
        ml AS (
          SELECT doc_id,
            '$Boiler1' || chr(10) ||
            array_to_string([array_to_string(
                w[(i-1)*$LineTokens+1 : i*$LineTokens], ' ')
              for i in generate_series(1,
                CAST(ceil(len(w) / $LineTokens.0) AS INTEGER))], chr(10)) ||
            (CASE WHEN doc_id % 2 = 0 THEN chr(10) || '$Boiler2' ELSE '' END)
              AS text
          FROM w),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml),
        flat AS (
          SELECT doc_id, pl['pos'] AS pos, pl['line'] AS line FROM (
            SELECT doc_id, unnest([{'pos': i, 'line': ls[i]}
              for i in generate_series(1, len(ls))]) AS pl
            FROM ls)),
        freq AS (
          SELECT ${portableHashSql("line")} AS h, count(*) AS c
          FROM flat GROUP BY 1 HAVING count(*) >= $LineMinFreq),
        flagged AS (
          SELECT f.doc_id, f.pos, f.line, (fr.h IS NOT NULL) AS dup
          FROM (SELECT doc_id, pos, line, ${portableHashSql("line")} AS h
                FROM flat) f
          LEFT JOIN freq fr USING (h))
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dropped,
               coalesce(array_to_string(list(line ORDER BY pos)
                 FILTER (WHERE NOT dup), chr(10)), '') AS text_clean
        FROM flagged GROUP BY doc_id"""
  }

  /** CTE chain `hosts_d` (page → host) → `l2` (resolved links) → `edges`
    * (weighted host→host) — shared by link_graph and pagerank_hosts so the
    * two oracles cannot drift. Targets are the same affine maps modulo the
    * corpus count the Spark plan uses.
    */
  private def linkGraphCtes: String = {
    val targets = LinkTargetExprs.map(e =>
      s"${e.replace("@N@", "nn.n")} % nn.n")
      .mkString("[", ", ", "]")
    s"""nn AS (SELECT count(*) AS n FROM documents),
        hosts_d AS (
          SELECT doc_id, source || '$HostSuffix' AS host FROM documents),
        l0 AS (
          SELECT doc_id, host AS src_host, $targets AS ts
          FROM hosts_d, nn),
        l AS (SELECT doc_id, src_host, unnest(ts) AS t FROM l0),
        l2 AS (
          SELECT l.src_host, d2.host AS dst_host
          FROM l JOIN hosts_d d2 ON d2.doc_id = l.t
          WHERE l.t <> l.doc_id),
        edges AS (
          SELECT src_host, dst_host, count(*) AS weight
          FROM l2 GROUP BY src_host, dst_host)"""
  }

  private def linkGraphSql: String =
    s"""WITH $linkGraphCtes
        SELECT src_host, dst_host, weight FROM edges"""

  /** The integer-micros PageRank iteration as chained CTEs r0..r$PrIters
    * over [[linkGraphCtes]]'s edges — all arithmetic 64-bit integer (`//`),
    * replaying Crawl.pageRankHosts exactly. Shared by pagerank_hosts and
    * the curation_authority gate; the final rank relation is `r$PrIters`.
    */
  private def pagerankCtes: String = {
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS (
            SELECT h.host,
                   CAST($PrBase + ($PrDampNum * coalesce(s.inflow, 0))
                     // $PrDampDen AS BIGINT) AS rank_micros
            FROM hosts h LEFT JOIN (
              SELECT e.dst_host AS host,
                     sum((r.rank_micros * e.weight) // o.out_w) AS inflow
              FROM edges e
              JOIN outw o USING (src_host)
              JOIN r${i - 1} r ON r.host = e.src_host
              GROUP BY e.dst_host) s USING (host))"""
    }.mkString(",\n")
    s"""$linkGraphCtes,
        outw AS (
          SELECT src_host, sum(weight) AS out_w FROM edges GROUP BY src_host),
        hosts AS (
          SELECT DISTINCT src_host AS host FROM edges
          UNION
          SELECT DISTINCT dst_host AS host FROM edges),
        r0 AS (
          SELECT host, CAST($PrInit AS BIGINT) AS rank_micros FROM hosts),
        $rounds"""
  }

  private def pagerankHostsSql: String =
    s"""WITH $pagerankCtes
        SELECT host, rank_micros FROM r$PrIters"""

  /** The integer-micros HITS iteration as chained CTEs replaying
    * Crawl.hitsHosts exactly: per round, auth half-round (hub⨝edges sum,
    * max-normalize) then hub half-round (auth⨝edges sum, max-normalize) —
    * all arithmetic `//` on BIGINT, the same grid as pagerankCtes.
    */
  private def hitsAuthoritySql: String = {
    val rounds = (1 to HitsIters).map { i =>
      s"""araw$i AS (
            SELECT e.dst_host AS host, sum(r.hub_micros * e.weight) AS raw
            FROM edges e JOIN h${i - 1} r ON r.host = e.src_host
            GROUP BY e.dst_host),
          amax$i AS (SELECT max(raw) AS m FROM araw$i),
          a$i AS (
            SELECT h.host,
                   CAST(coalesce(s.raw, 0)
                     // greatest(am.m // 1000000, 1) AS BIGINT) AS auth_micros
            FROM hosts h LEFT JOIN araw$i s USING (host)
            CROSS JOIN amax$i am),
          hraw$i AS (
            SELECT e.src_host AS host, sum(a.auth_micros * e.weight) AS raw
            FROM edges e JOIN a$i a ON a.host = e.dst_host
            GROUP BY e.src_host),
          hmax$i AS (SELECT max(raw) AS m FROM hraw$i),
          h$i AS (
            SELECT h.host,
                   CAST(coalesce(s.raw, 0)
                     // greatest(hm.m // 1000000, 1) AS BIGINT) AS hub_micros
            FROM hosts h LEFT JOIN hraw$i s USING (host)
            CROSS JOIN hmax$i hm)"""
    }.mkString(",\n")
    s"""WITH $linkGraphCtes,
        hosts AS (
          SELECT DISTINCT src_host AS host FROM edges
          UNION
          SELECT DISTINCT dst_host AS host FROM edges),
        h0 AS (
          SELECT host, CAST(1000000 AS BIGINT) AS hub_micros FROM hosts),
        $rounds
        SELECT host, a$HitsIters.auth_micros, h$HitsIters.hub_micros
        FROM a$HitsIters JOIN h$HitsIters USING (host)"""
  }

  // community_labelprop: synchronous rounds over the undirected host graph
  private val LpIters = 4

  /** community_labelprop twin: the undirected weighted graph (both edge
    * directions summed), then [[LpIters]] SYNCHRONOUS label-propagation
    * rounds as unrolled CTE pairs — weighted label votes from the previous
    * round's labels, then the per-node `(weight desc, label asc)` top-1 —
    * replaying Crawl.labelPropagate exactly (integer weights and string
    * labels only, so there is no float trajectory to drift).
    */
  private def communityLabelpropSql: String = {
    val rounds = (1 to LpIters).map { i =>
      s"""lv$i AS (
            SELECT u.a, l.label, CAST(sum(u.w) AS BIGINT) AS lw
            FROM und u JOIN lp${i - 1} l ON l.host = u.b
            GROUP BY u.a, l.label),
          lp$i AS (
            SELECT a AS host, label FROM (
              SELECT a, label,
                     row_number() OVER (PARTITION BY a
                       ORDER BY lw DESC, label) AS r
              FROM lv$i)
            WHERE r = 1)"""
    }.mkString(",\n")
    s"""WITH $linkGraphCtes,
        und AS (
          SELECT a, b, CAST(sum(w) AS BIGINT) AS w FROM (
            SELECT src_host AS a, dst_host AS b, weight AS w FROM edges
            UNION ALL
            SELECT dst_host, src_host, weight FROM edges)
          GROUP BY a, b),
        lp0 AS (SELECT DISTINCT a AS host, a AS label FROM und),
        $rounds
        SELECT host, label AS community FROM lp$LpIters"""
  }

  /** curation_authority twin: every doc joins its host's final rank; docs
    * on hosts below the authority floor drop.
    */
  private def curationAuthoritySql: String =
    s"""WITH $pagerankCtes
        SELECT d.doc_id, h.host, r.rank_micros,
               (r.rank_micros >= $AuthorityFloor) AS keep
        FROM documents d
        JOIN hosts_d h USING (doc_id)
        JOIN r$PrIters r ON r.host = h.host"""

  /** stream_authority twin: the same rank join as a LEFT join with the
    * unseen-host rank-0 conservative default — the streamed gate's exact
    * semantics.
    */
  private def streamAuthoritySql: String =
    s"""WITH $pagerankCtes
        SELECT d.doc_id, h.host,
               coalesce(r.rank_micros, 0) AS rank_micros,
               (coalesce(r.rank_micros, 0) >= $AuthorityFloor) AS keep
        FROM documents d
        JOIN hosts_d h USING (doc_id)
        LEFT JOIN r$PrIters r ON r.host = h.host"""

  /** crawl_frontier twin: distinct uncrawled link targets resolve to their
    * host, join the host rank, take the per-host politeness window then
    * the global budget cut — `(rank desc, url)` is a total order (urls are
    * unique), so the LIMIT set is deterministic.
    */
  private def crawlFrontierSql: String =
    s"""WITH $pagerankCtes,
        cand AS (
          SELECT DISTINCT d2.host, l.t
          FROM l JOIN hosts_d d2 ON d2.doc_id = l.t
          WHERE l.t <> l.doc_id AND l.t % $FrontierFetchedMod <> 0),
        slotted AS (
          SELECT 'https://' || c.host || '/doc/' || CAST(c.t AS VARCHAR)
                   AS url,
                 c.host, r.rank_micros,
                 row_number() OVER (
                   PARTITION BY c.host
                   ORDER BY 'https://' || c.host || '/doc/' ||
                            CAST(c.t AS VARCHAR)) AS host_slot
          FROM cand c JOIN r$PrIters r ON r.host = c.host)
        SELECT url, host, rank_micros, host_slot
        FROM slotted WHERE host_slot <= $FrontierHostCap
        ORDER BY rank_micros DESC, url
        LIMIT $FrontierBudget"""

  // --- the declarative crawl journey --------------------------------------

  // Gate bounds for the config journey, applied to the EXTRACTED text
  // (~12 wrapper words on top of the 10-99 body words).
  private val CrawlGateMinWords = 40
  private val CrawlGateMinStops = 1

  /** CTEs `h` (wrapper) → `ex` (extracted) → `gated` (Gopher gate) over
    * `documents` — the shared prefix of the batch and streaming journeys.
    */
  private def crawlPrefixCtes: String = {
    val stops = Crawl.GopherStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""h AS (SELECT doc_id, source, $htmlBuildSql AS html FROM documents),
        ex AS (SELECT doc_id, source, $extractChainSql AS text FROM h),
        gated AS (
          SELECT doc_id, source, text FROM ex
          WHERE len(regexp_split_to_array(text, '\\s+')) >= $CrawlGateMinWords
            AND len(list_intersect(
                  list_distinct([lower(x)
                    for x in regexp_split_to_array(text, '\\s+')]),
                  $stops)) >= $CrawlGateMinStops)"""
  }

  /** extract → gopher → dedup_lines, fully composed: the wrapper's menu /
    * heading / lang lines are corpus-frequent and must vanish; body lines
    * survive.
    */
  private def configCorpusCrawlSql: String = {
    import graft.functions.Text.portableHashSql
    s"""WITH $crawlPrefixCtes,
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM gated),
        flat AS (
          SELECT doc_id, pl['pos'] AS pos, pl['line'] AS line FROM (
            SELECT doc_id, unnest([{'pos': i, 'line': ls[i]}
              for i in generate_series(1, len(ls))]) AS pl
            FROM ls)),
        freq AS (
          SELECT ${portableHashSql("line")} AS h, count(*) AS c
          FROM flat GROUP BY 1 HAVING count(*) >= $LineMinFreq),
        flagged AS (
          SELECT f.doc_id, f.pos, f.line, (fr.h IS NOT NULL) AS dup
          FROM (SELECT doc_id, pos, line, ${portableHashSql("line")} AS h
                FROM flat) f
          LEFT JOIN freq fr USING (h))
        SELECT doc_id,
               coalesce(array_to_string(list(line ORDER BY pos)
                 FILTER (WHERE NOT dup), chr(10)), '') AS text
        FROM flagged GROUP BY doc_id"""
  }

  private def streamCorpusExtractSql: String =
    s"""WITH $crawlPrefixCtes
        SELECT doc_id, text FROM gated"""

  /** Write the deterministic HTML corpus once per invocation (overwrite) —
    * the raw-crawl source both config journeys read.
    */
  private def writeHtmlCorpus(s: org.apache.spark.sql.SparkSession,
                              d: String, scratch: String): Unit = {
    val html = concat(
      lit(H1), col("doc_id").cast("string"), lit(H2), col("source"),
      lit(H3), col("source"), lit(H4), col("text"),
      lit(H5), col("lang"), lit(H6))
    documents(s, d)
      .select(col("doc_id"), col("source"), html.as("text"))
      .write.mode("overwrite").parquet(s"$scratch/docs.parquet")
  }

  private def crawlYaml(scratch: String, steps: String): String =
    s"""sources:
       |  - id: docs
       |    loader: { transport: fs, path: $scratch/docs.parquet, reader: { format: parquet } }
       |corpus:
       |  source: docs
       |  id: doc_id
       |  text: text
       |  steps:
       |$steps
       |""".stripMargin

  // --- queries ------------------------------------------------------------

  val queries: Map[String, QueryFn] = Map(
    // HTML text extraction: the first step of a web-crawl pipeline. Both
    // engines wrap each document in the same deterministic HTML (entities,
    // script with a raw '<', comments, list markup) and extract title +
    // visible text — pure codegen'd string work, zero shuffle.
    "html_extract" -> { (s, d) =>
      val html = concat(
        lit(H1), col("doc_id").cast("string"), lit(H2), col("source"),
        lit(H3), col("source"), lit(H4), col("text"),
        lit(H5), col("lang"), lit(H6))
      Crawl.extractHtml(
        documents(s, d).withColumn("html", html), "doc_id", "html")
    },

    // URL canonicalization + URL-level dedup: normalize (case, default
    // port, fragment, tracking params, trailing slash), keep min-id per
    // canonical URL, flag blocklisted hosts. Only (id, url_norm) shuffles.
    "url_dedup" -> { (s, d) =>
      val url = concat(
        lit(U1), upper(col("source")), lit(U2),
        pmod(col("doc_id"), lit(40)).cast("string"),
        when(pmod(col("doc_id"), lit(4)) === 0, "/").otherwise(""),
        lit(U3), pmod(col("doc_id"), lit(5)).cast("string"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("&page="), pmod(col("doc_id"), lit(7)).cast("string")))
          .otherwise(""),
        lit("#sec"), pmod(col("doc_id"), lit(4)).cast("string"))
      Crawl.urlDedup(
        documents(s, d).withColumn("url", url), "doc_id", "url", BlockedHosts)
    },

    // The Gopher composite quality gate: five public rule signals computed
    // in one codegen'd pass, each emitted beside its verdict.
    "quality_gopher" -> { (s, d) =>
      Crawl.gopherRules(documents(s, d), "doc_id", "text",
        minWords = MinWords, maxWords = MaxWords,
        minMeanLen = MinMeanLen, maxMeanLen = MaxMeanLen,
        maxSymbolRatio = MaxSymbolRatio, minAlphaFrac = MinAlphaFrac,
        minStops = MinStops)
    },

    // Inter-gate AGREEMENT audit — the two independent quality signals
    // (the heuristic score at the funnel threshold, the Gopher composite
    // bounds) judged as two labelers via Cohen's kappa: both verdicts are
    // per-row codegen'd expressions in ONE scan, the 2×2 confusion is one
    // partial-aggregated global aggregate (one row leaves the shuffle),
    // and kappa = (po − pe)/(1 − pe) is one IEEE expression at the end.
    // Low kappa means the gates disagree on what "quality" is — the audit
    // a pipeline runs before swapping one gate for the other.
    "gate_agreement" -> { (s, d) =>
      import graft.functions.Text
      val a = Text.qualityScore(col("text")) >= 0.35
      val b = Crawl.gopherKeep(col("text"),
        Some(MinWords), Some(MaxWords), Some(MinMeanLen), Some(MaxMeanLen),
        Some(MaxSymbolRatio), Some(MinAlphaFrac), Some(MinStops))
      val agg = documents(s, d)
        .select(a.as("a"), b.as("b"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n_both"),
          sum(when(col("a") && !col("b"), 1L).otherwise(0L))
            .as("n_quality_only"),
          sum(when(!col("a") && col("b"), 1L).otherwise(0L))
            .as("n_gopher_only"),
          sum(when(!col("a") && !col("b"), 1L).otherwise(0L))
            .as("n_neither"))
      val n = col("n").cast("double")
      val po = (col("n_both") + col("n_neither")).cast("double") / n
      val pa = (col("n_both") + col("n_quality_only")).cast("double") / n
      val pb = (col("n_both") + col("n_gopher_only")).cast("double") / n
      val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
      agg.select(col("n"), col("n_both"), col("n_quality_only"),
        col("n_gopher_only"), col("n_neither"),
        when(lit(1.0) - pe === 0.0, lit(0.0))
          .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
    },

    // Corpus-wide duplicated-line removal (the C4/CCNet boilerplate pass):
    // both engines build the same line structure (8-token lines + planted
    // banner/footer boilerplate), then drop every line occurring >= 2 times
    // corpus-wide and rebuild documents in original line order.
    // The declarative CRAWL journey: a raw-HTML corpus enters the config
    // surface and comes out curated — extract (block-aware visible text) →
    // gopher gate → corpus-wide duplicated-line removal, folded into one
    // plan. The wrapper's menu/heading/lang lines are corpus-frequent and
    // vanish; unique body lines survive in order.
    "config_corpus_crawl" -> { (s, d) =>
      val scratch = "/tmp/graft_scratch/crawl_html"
      writeHtmlCorpus(s, d, scratch)
      val project = graft.pipeline.Config.parseProject(crawlYaml(scratch,
        s"""    - { step: extract, format: html }
           |    - { step: gopher, min_words: $CrawlGateMinWords, min_stops: $CrawlGateMinStops }
           |    - { step: dedup_lines, min_freq: $LineMinFreq }""".stripMargin))
      graft.pipeline.ConfigRuntime.corpus(s, d, project)
        .select(col("doc_id"), col("text"))
    },

    // The crawl front-end AT INGEST: extraction + the Gopher gate are pure
    // per-row expressions, so the same config document streams — each
    // arriving page is extracted and gated with zero state. Corpus-at-rest
    // steps (dedup_lines) are rejected by name on the stream.
    "stream_corpus_extract" -> { (s, d) =>
      val scratch = "/tmp/graft_scratch/crawl_html"
      writeHtmlCorpus(s, d, scratch)
      val project = graft.pipeline.Config.parseProject(crawlYaml(scratch,
        s"""    - { step: extract, format: html }
           |    - { step: gopher, min_words: $CrawlGateMinWords, min_stops: $CrawlGateMinStops }""".stripMargin))
      graft.streaming.Streaming.runCorpusStream(s, d, project,
        s"graft_stream_extract_${StreamRun.incrementAndGet()}")
        .select(col("doc_id"), col("text"))
    },

    // Host-level link graph: per-page outlinks (deterministic affine-map
    // targets shared with the oracle) resolve to target hosts through one
    // id-keyed join and aggregate to weighted host→host edges — only
    // (id, host, target) rows enter the shuffle, bodies never move.
    "link_graph" -> { (s, d) =>
      val docs = documents(s, d)
      // plan-build cardinality from the table's parquet footers — a
      // driver-side metadata read, not a count() job (guide §5)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      Crawl.linkGraph(
        docs.withColumn("host", concat(col("source"), lit(HostSuffix))),
        "doc_id", "host", targets)
    },

    // PageRank over the host graph in integer micros: 5 join+aggregate
    // rounds with the rank state left distributed (checkpointed constant
    // plan depth) — every arithmetic step 64-bit integer, so the
    // trajectory replays exactly in the oracle.
    "pagerank_hosts" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val edges = Crawl.linkGraph(
        docs.withColumn("host", concat(col("source"), lit(HostSuffix))),
        "doc_id", "host", targets)
      Crawl.pageRankHosts(edges, PrIters, PrInit, PrBase, PrDampNum, PrDampDen)
    },

    // HITS hubs & authorities over the same host graph — the second
    // classic authority signal (directories score as hubs, link targets
    // as authorities), integer-micros with max-normalized half-rounds so
    // the trajectory replays exactly in the oracle's chained CTEs.
    "hits_authority" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val edges = Crawl.linkGraph(
        docs.withColumn("host", concat(col("source"), lit(HostSuffix))),
        "doc_id", "host", targets)
      Crawl.hitsHosts(edges, HitsIters)
    },

    // Community detection over the host graph: deterministic synchronous
    // label propagation with the (weight desc, label asc) adoption rule —
    // host mirrors/syndication rings collapse to one community, the
    // domain-level grouping a curation pass uses to cap near-identical
    // sites. Labels stay distributed (one edge⨝label join + bounded
    // groupBy per round, localCheckpoint'd constant plan depth).
    "community_labelprop" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val edges = Crawl.linkGraph(
        docs.withColumn("host", concat(col("source"), lit(HostSuffix))),
        "doc_id", "host", targets)
      Crawl.labelPropagate(edges, LpIters)
    },

    // Authority gate: every page joins its host's PageRank and pages on
    // hosts below the floor drop — the domain-level quality prior of
    // crawl curation. The rank frame is host-scale; bodies never move.
    "curation_authority" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val hosts = docs.withColumn("host",
        concat(col("source"), lit(HostSuffix)))
      val edges = Crawl.linkGraph(hosts, "doc_id", "host", targets)
      val ranks = Crawl.pageRankHosts(edges, PrIters, PrInit, PrBase,
        PrDampNum, PrDampDen)
      Crawl.authorityGate(hosts, "doc_id", "host", ranks, AuthorityFloor)
    },

    // The authority gate AT INGEST: ranks fit batch-side once and persist
    // as a parquet artifact; each arriving page gates through a
    // stream-static left join against the hydrated rank frame (re-planned
    // per micro-batch, zero state). Unseen hosts rank 0 and drop.
    "stream_authority" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val hosts = docs.withColumn("host",
        concat(col("source"), lit(HostSuffix)))
      val art = "/tmp/graft_scratch/stream_authority/ranks.parquet"
      Crawl.pageRankHosts(Crawl.linkGraph(hosts, "doc_id", "host", targets),
        PrIters, PrInit, PrBase, PrDampNum, PrDampDen)
        .write.mode("overwrite").parquet(art)
      graft.streaming.Streaming.authorityGateStream(s, d,
        concat(col("source"), lit(HostSuffix)), s.read.parquet(art),
        AuthorityFloor,
        s"graft_stream_authority_${StreamRun.incrementAndGet()}")
    },

    // Frontier scheduling: distinct uncrawled link targets (resolved to
    // their host through the id-keyed join — metadata-scale rows only)
    // prioritize by dst-host PageRank, then the per-host politeness
    // window and the global TakeOrdered budget cut pick the fetch batch.
    "crawl_frontier" -> { (s, d) =>
      val docs = documents(s, d)
      // footer-count cardinality (see link_graph)
      val n = graft.sources.ParquetMeta.tableRows(s, d, "documents")
      val targets = linkTargets(n)
      val hosts = docs.withColumn("host",
        concat(col("source"), lit(HostSuffix)))
      val hostsD = hosts.select(col("doc_id"), col("host"))
      val cand = hostsD
        .select(col("doc_id"), explode(targets).as("t"))
        .where(col("t") =!= col("doc_id") &&
          col("t") % FrontierFetchedMod =!= 0)
        .join(hostsD.select(col("doc_id").as("t"), col("host")), "t")
        .select(col("host"), col("t")).distinct()
        .select(concat(lit("https://"), col("host"), lit("/doc/"),
          col("t").cast("string")).as("url"), col("host"))
      val ranks = Crawl.pageRankHosts(
        Crawl.linkGraph(hosts, "doc_id", "host", targets),
        PrIters, PrInit, PrBase, PrDampNum, PrDampDen)
      Crawl.frontier(cand.join(ranks, "host"), "url", "host",
        "rank_micros", FrontierHostCap, FrontierBudget)
    },

    "line_dedup" -> { (s, d) =>
      val w = split(col("text"), "\\s+")
      val nLines = ceil(size(w) / lit(LineTokens.toDouble)).cast("int")
      val body = array_join(
        transform(sequence(lit(1), nLines),
          i => array_join(slice(w, (i - 1) * LineTokens + 1, lit(LineTokens)), " ")),
        "\n")
      val ml = concat(
        lit(Boiler1), lit("\n"), body,
        when(pmod(col("doc_id"), lit(2)) === 0, concat(lit("\n"), lit(Boiler2)))
          .otherwise(""))
      Crawl.lineDedup(
        documents(s, d).withColumn("ml", ml), "doc_id", "ml", LineMinFreq)
    }
  )

  private val StreamRun = new java.util.concurrent.atomic.AtomicInteger(0)

  val oracleSql: Map[String, String] = Map(
    "html_extract" -> htmlExtractSql,
    "url_dedup" -> urlDedupSql,
    "quality_gopher" -> qualityGopherSql,
    "gate_agreement" -> gateAgreementSql,
    "link_graph" -> linkGraphSql,
    "pagerank_hosts" -> pagerankHostsSql,
    "hits_authority" -> hitsAuthoritySql,
    "community_labelprop" -> communityLabelpropSql,
    "curation_authority" -> curationAuthoritySql,
    "stream_authority" -> streamAuthoritySql,
    "crawl_frontier" -> crawlFrontierSql,
    "line_dedup" -> lineDedupSql,
    "config_corpus_crawl" -> configCorpusCrawlSql,
    "stream_corpus_extract" -> streamCorpusExtractSql
  )
}
