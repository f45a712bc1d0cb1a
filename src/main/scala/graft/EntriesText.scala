package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import org.apache.spark.sql.types.StructType

import graft.ann.Ann
import graft.dedup.{Clusters, Dedup, SimHash}
import graft.ingest.{FileListing, Router, ZipSource}
import graft.multimodal.Multimodal
import graft.operators.Salted
import graft.pipeline.SchemaEvolution
import graft.schema.{ColumnSpec, TableSpec}
import graft.streaming.Bookmark
import graft.text.{Dsir, TextAnalysis}
import graft.relationalize.Relationalize
import graft.sources.{JsonDataset, ParquetDataset, TarShards, Warc}
import graft.validate.{ErrorSuppression, FileMetadata, JsonSchemaValidator, SchemaCache, SchemaResolver}


/** LLM-pipeline text-analysis tier.
  *
  * Split from the single SparkEntry registry file by tier; entry
  * semantics, names, and oracles are unchanged. [[SparkEntry]] holds
  * the one declaration-ordered registry over all tiers.
  */
private[graft] object EntriesText {
  import EntryKit._

  // LLM-pipeline: text analysis
  // --------------------------------------------------------------------

  /** Token counting: whitespace tokens + BPE-ish subword pieces. */
  val textTokens = Q(
    (s, dir) => t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordCount(col("text")).cast("int").as("n_subwords")),
    Some("SELECT doc_id, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS INT) AS n_tokens, CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_subwords FROM documents"))

  /** Language-ID heuristic: argmax of per-language marker-token hits. */
  val textLangId = Q(
    (s, dir) => t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_pred")),
    Some("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), s AS (SELECT doc_id, len(list_filter(t, x -> list_contains(['der','die','das','und','nicht','ist'], x))) AS de, len(list_filter(t, x -> list_contains(['the','a','of','and','to','in'], x))) AS en, len(list_filter(t, x -> list_contains(['el','los','las','y','que','una'], x))) AS es, len(list_filter(t, x -> list_contains(['le','les','et','dans','une','est'], x))) AS fr FROM tk) SELECT doc_id, CASE WHEN de >= en AND de >= es AND de >= fr AND de > 0 THEN 'de' WHEN en >= es AND en >= fr AND en > 0 THEN 'en' WHEN es >= fr AND es > 0 THEN 'es' WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred FROM s"))

  /** Quality scoring: length/stopword/punctuation composite. */
  val textQuality = Q(
    (s, dir) => t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality")),
    Some("WITH b AS (SELECT doc_id, text, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n, CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS stophits, CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct FROM documents) SELECT doc_id, floor((least(1.0, n / 100.0) * 0.4 + least(1.0, stophits / n * 5.0) * 0.3 + (1.0 - punct / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality FROM b"))

  /** The canonical training-data curation pipeline as ONE composite:
    * quality-score, language-identify, filter, then fingerprint-dedup
    * the survivors (keep the smallest doc id per fingerprint). Each
    * stage has its own oracle entry; this one proves they COMPOSE — all
    * three scoring expressions ride a single scan projection (no UDFs,
    * no extra passes) and the dedup aggregate is the only shuffle in
    * the plan. Duplicates share identical text, so the keeper's
    * quality/lang equal any member's.
    */
  val corpusCuration = Q(
    (s, dir) => {
      val scored = t(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.langId(col("text")).as("lang_pred"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .where(col("quality") >= 0.5 && col("lang_pred") =!= "und")
      scored.groupBy(col("fp"))
        .agg(
          min_by(struct(col("doc_id"), col("quality"), col("lang_pred")),
            col("doc_id")).as("k"),
          count(lit(1)).as("n_dups"))
        .select(col("k.doc_id").as("doc_id"),
          col("k.quality").as("quality"),
          col("k.lang_pred").as("lang_pred"), col("n_dups"))
    },
    Some("WITH b AS (SELECT doc_id, text, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n, CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS stophits, CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct FROM documents), q AS (SELECT doc_id, floor((least(1.0, n / 100.0) * 0.4 + least(1.0, stophits / n * 5.0) * 0.3 + (1.0 - punct / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality FROM b), tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents), sl AS (SELECT doc_id, len(list_filter(t, x -> list_contains(['der','die','das','und','nicht','ist'], x))) AS de, len(list_filter(t, x -> list_contains(['the','a','of','and','to','in'], x))) AS en, len(list_filter(t, x -> list_contains(['el','los','las','y','que','una'], x))) AS es, len(list_filter(t, x -> list_contains(['le','les','et','dans','une','est'], x))) AS fr FROM tk), l AS (SELECT doc_id, CASE WHEN de >= en AND de >= es AND de >= fr AND de > 0 THEN 'de' WHEN en >= es AND en >= fr AND en > 0 THEN 'en' WHEN es >= fr AND es > 0 THEN 'es' WHEN fr > 0 THEN 'fr' ELSE 'und' END AS lang_pred FROM sl), kept AS (SELECT q.doc_id, q.quality, l.lang_pred, md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp FROM q JOIN l ON l.doc_id = q.doc_id JOIN documents d ON d.doc_id = q.doc_id WHERE q.quality >= 0.5 AND l.lang_pred <> 'und'), g AS (SELECT fp, min(doc_id) AS doc_id, count(*) AS n_dups FROM kept GROUP BY fp) SELECT g.doc_id, k.quality, k.lang_pred, g.n_dups FROM g JOIN kept k ON k.doc_id = g.doc_id"))

  /** Document fingerprinting: md5 of normalized text. */
  val textFingerprint = Q(
    (s, dir) => t(s, dir, "documents").select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp")),
    Some("SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents"))

  /** PII redaction ([[graft.text.Pii]]) — the compliance gate before a
    * corpus ships: emails, IPv4s, and phone numbers masked in one
    * codegen'd projection, with a per-doc match count. The synthetic
    * corpus carries no PII, so the entry plants deterministic PII
    * (email / IP / phone keyed off doc_id residues) identically in
    * both engines — the redaction itself, patterns, masking order, and
    * count arithmetic are what the oracle checks. Patterns stay in the
    * RE2-compatible subset so the same pattern text means the same
    * matches in Java regex and DuckDB.
    */
  val textPiiRedact = Q(
    (s, dir) => {
      val aug = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        .withColumn("s", concat(
          col("text"),
          when(col("doc_id") % 3 === 0, concat(lit(" contact "),
            col("source"), lit("@mail.example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0, concat(lit(" from 10.0."),
            (col("doc_id") % 256).cast("string"), lit(".7"))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0, concat(lit(" call (555) 123-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("s"))
      graft.text.Pii.redact(aug, "s")
        .select(col("doc_id"), col("s_redacted").as("text_redacted"),
          col("n_pii"))
    },
    Some("WITH aug AS (SELECT doc_id, text || CASE WHEN doc_id % 3 = 0 THEN ' contact ' || source || '@mail.example.com' ELSE '' END || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' ELSE '' END || CASE WHEN doc_id % 7 = 0 THEN ' call (555) 123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS s FROM documents), s1 AS (SELECT doc_id, s, regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1 FROM aug), s2 AS (SELECT doc_id, s, t1, regexp_replace(t1, '\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b', '[IP]', 'g') AS t2 FROM s1) SELECT doc_id, regexp_replace(t2, '(?:\\+1[ -])?(?:\\(\\d{3}\\)[ -]?|\\d{3}-)\\d{3}-\\d{4}', '[PHONE]', 'g') AS text_redacted, CAST(len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) + len(regexp_extract_all(t1, '\\b(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)(?:\\d{1,3}\\.)\\d{1,3}\\b')) + len(regexp_extract_all(t2, '(?:\\+1[ -])?(?:\\(\\d{3}\\)[ -]?|\\d{3}-)\\d{3}-\\d{4}')) AS BIGINT) AS n_pii FROM s2"))

  /** Web-domain curation ([[graft.text.WebCuration]]) — the crawl-side
    * gate: URL → lowercased host (userinfo skipped, port stripped),
    * blocklisted domains dropped via a broadcast ANTI join (the corpus
    * never shuffles), survivors enriched with per-domain stats (one
    * hash aggregate, domain-sized, broadcast back). URLs are planted
    * deterministically from (source, doc_id) identically in both
    * engines — extraction, filtering, and stats are what the oracle
    * checks.
    */
  val webDomainCuration = Q(
    (s, dir) => {
      import graft.text.WebCuration
      val u = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"))
        .withColumn("url", concat(
          when(col("doc_id") % 2 === 0, lit("https://"))
            .otherwise(lit("http://user@")),
          col("source"), lit(".Example.com"),
          when(col("doc_id") % 4 === 1, lit(":8080")).otherwise(lit("")),
          lit("/d/"), col("doc_id").cast("string")))
      val blocklist = s.createDataFrame(
        s.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("src0.example.com"),
          org.apache.spark.sql.Row("src13.example.com"))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("blocked_domain",
            org.apache.spark.sql.types.StringType))))
      val kept = WebCuration.blocklistFilter(
        WebCuration.withDomain(u, "url"), "domain", blocklist)
      val stats = WebCuration.domainStats(kept, "domain", "n_chars")
      kept.join(broadcast(stats), "domain")
        .select(col("doc_id"), col("domain"),
          col("domain_docs"), col("domain_avg"))
    },
    Some("WITH u AS (SELECT doc_id, n_chars, CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://user@' END || source || '.Example.com' || CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END || '/d/' || CAST(doc_id AS VARCHAR) AS url FROM documents), d AS (SELECT doc_id, n_chars, lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS domain FROM u), kept AS (SELECT * FROM d WHERE domain NOT IN ('src0.example.com', 'src13.example.com')), stats AS (SELECT domain, count(*) AS domain_docs, round(avg(n_chars), 4) AS domain_avg FROM kept GROUP BY 1) SELECT k.doc_id, k.domain, s.domain_docs, s.domain_avg FROM kept k JOIN stats s USING (domain)"))

  /** URL canonicalization ([[graft.text.WebCuration.canonicalizeUrl]]):
    * fragment + tracking-param strip, authority lowercasing, default-port
    * and bare-trailing-slash removal — the normalize-before-dedup step of
    * crawl curation. Six planted URL shapes exercise every rule
    * (tracking runs, adjacent kept params, default vs explicit ports,
    * userinfo, schemeless passthrough); the oracle replays the identical
    * RE2 rewrite chain (replacement syntax aside: `$1` here, `\\1` there).
    */
  val webUrlCanonical = Q(
    (s, dir) => {
      import graft.text.WebCuration
      val n = col("doc_id").cast("string")
      val u = t(s, dir, "documents").select(col("doc_id"),
        (col("doc_id") % 6).cast("int").as("m"), n.as("n"))
        .withColumn("url",
          when(col("m") === 0, concat(lit("HTTP://Example.COM:80/p/P"),
            col("n"), lit("?utm_source=a&id="), col("n"),
            lit("&utm_campaign=c#frag")))
          .when(col("m") === 1, lit("https://CDN.example.org:443/"))
          .when(col("m") === 2,
            concat(lit("https://Site.example.net/A/b?fbclid=x"), col("n")))
          .when(col("m") === 3,
            lit("http://example.com/s?q=Spark&gclid=g&msclkid=m"))
          .when(col("m") === 4,
            concat(lit("http://User@Host.example.com:8080/x?a=1&b="), col("n")))
          .otherwise(concat(lit("plain text "), col("n"))))
      WebCuration.withCanonicalUrl(u, "url")
        .select(col("doc_id"), col("url"), col("url_canonical"))
    },
    Some("WITH u AS (SELECT doc_id, CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN 'HTTP://Example.COM:80/p/P' || CAST(doc_id AS VARCHAR) || '?utm_source=a&id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=c#frag' WHEN 1 THEN 'https://CDN.example.org:443/' WHEN 2 THEN 'https://Site.example.net/A/b?fbclid=x' || CAST(doc_id AS VARCHAR) WHEN 3 THEN 'http://example.com/s?q=Spark&gclid=g&msclkid=m' WHEN 4 THEN 'http://User@Host.example.com:8080/x?a=1&b=' || CAST(doc_id AS VARCHAR) ELSE 'plain text ' || CAST(doc_id AS VARCHAR) END AS url FROM documents), s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '', 'g') AS nf FROM u), s2 AS (SELECT doc_id, url, regexp_replace(nf, '([?&])(?:(?:utm_[A-Za-z]+|gclid|fbclid|msclkid|mc_eid|igshid)=[^&#]*(?:&|$))+', '\\1', 'g') AS nt0 FROM s1), s3 AS (SELECT doc_id, url, regexp_replace(nt0, '[?&]+$', '', 'g') AS nt FROM s2), s4 AS (SELECT doc_id, url, nt, lower(regexp_extract(nt, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) AS auth, regexp_replace(nt, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '', 'g') AS rest FROM s3), s5 AS (SELECT doc_id, url, nt, rest, CASE WHEN auth = '' THEN NULL ELSE regexp_replace(regexp_replace(auth, '^(http://[^/?#]*):80$', '\\1', 'g'), '^(https://[^/?#]*):443$', '\\1', 'g') END AS a2 FROM s4) SELECT doc_id, url, CASE WHEN a2 IS NULL THEN nt ELSE a2 || CASE WHEN rest = '/' THEN '' ELSE rest END END AS url_canonical FROM s5"))

  /** URL-level crawl dedup — the FIRST dedup every crawl pipeline runs,
    * before any content hashing: canonicalize
    * ([[graft.text.WebCuration.withCanonicalUrl]]) → group by the
    * canonical form → keep the best-quality variant (n_chars, doc_id
    * tie-break). The fixture plants three variants per page (bare,
    * tracking-params + fragment + cased authority + default port,
    * tracking-only) that must collapse to ONE canonical; the oracle
    * derives the canonical from the planting arithmetic alone (the
    * regex chain itself is pinned by `web_url_canonical`) and re-picks
    * the keeper with a row_number window.
    */
  val webUrlDedup = Q(
    (s, dir) => {
      import graft.text.WebCuration
      val k = floor(col("doc_id") / 3).cast("long").cast("string")
      val m = (col("doc_id") % 3).cast("int")
      val u = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(m === 0, concat(lit("http://example.com/page/"), k))
            .when(m === 1, concat(lit("HTTP://Example.COM:80/page/"), k,
              lit("?utm_source=x#f")))
            .otherwise(concat(lit("http://example.com/page/"), k,
              lit("?utm_campaign=y"))).as("url"))
      WebCuration.withCanonicalUrl(u, "url")
        .groupBy(col("url_canonical"))
        .agg(count(lit(1)).as("n_variants"),
          max_by(struct(col("doc_id"), col("n_chars")),
            struct(col("n_chars"), col("doc_id"))).as("b"))
        .select(col("url_canonical"), col("n_variants"),
          col("b.doc_id").as("keeper_id"), col("b.n_chars").as("keeper_chars"))
    },
    Some("WITH u AS (SELECT doc_id, n_chars, 'http://example.com/page/' || CAST(doc_id // 3 AS VARCHAR) AS url_canonical FROM documents), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY url_canonical ORDER BY n_chars DESC, doc_id DESC) AS r, count(*) OVER (PARTITION BY url_canonical) AS n FROM u) " +
      "SELECT url_canonical, CAST(n AS BIGINT) AS n_variants, doc_id AS keeper_id, n_chars AS keeper_chars FROM rk WHERE r = 1"))

  /** HTML-to-text extraction ([[graft.text.Html]]): script/style/comment
    * payloads dropped, tags → word boundaries, entities decoded,
    * whitespace collapsed. HTML chrome is planted deterministically around each
    * document's text in BOTH engines; the oracle replays the identical
    * RE2 pattern chain and literal entity replaces.
    */
  val textHtmlExtract = Q(
    (s, dir) => {
      import graft.text.Html
      val h = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", concat(
          lit("<html><head><title>T</title><style type=\"text/css\">.a{color:red}</style></head><body>"),
          when(col("doc_id") % 3 === 0,
            lit("<script src=\"x.js\">var x = 1 < 2 && y > 0;</script>"))
            .otherwise(lit("")),
          lit("<!-- c "), col("doc_id").cast("string"),
          lit(" --><p class=\"main\">"), col("text"), lit("</p>"),
          when(col("doc_id") % 5 === 0,
            lit("<div>&quot;q&quot; &amp; &lt;e&gt;&nbsp;tail</div>"))
            .otherwise(lit("")),
          lit("</body></html>")))
      Html.stripHtml(h, "html").select(col("doc_id"), col("html_text"))
    },
    Some("WITH h AS (SELECT doc_id, '<html><head><title>T</title><style type=\"text/css\">.a{color:red}</style></head><body>' || CASE WHEN doc_id % 3 = 0 THEN '<script src=\"x.js\">var x = 1 < 2 && y > 0;</script>' ELSE '' END || '<!-- c ' || CAST(doc_id AS VARCHAR) || ' --><p class=\"main\">' || text || '</p>' || CASE WHEN doc_id % 5 = 0 THEN '<div>&quot;q&quot; &amp; &lt;e&gt;&nbsp;tail</div>' ELSE '' END || '</body></html>' AS html FROM documents), s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>', ' ', 'g') AS x FROM h), s2 AS (SELECT doc_id, regexp_replace(x, '(?s)<!--.*?-->', ' ', 'g') AS x FROM s1), s3 AS (SELECT doc_id, regexp_replace(x, '</?[A-Za-z][^>]*>', ' ', 'g') AS x FROM s2), s4 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(x, '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x FROM s3) SELECT doc_id, trim(regexp_replace(x, '\\s+', ' ', 'g')) AS html_text FROM s4"))

  /** Link-graph extraction ([[graft.text.Html.extractLinks]]) — the
    * edge list behind crawl prioritization and PageRank: anchors
    * planted deterministically off doc_id arithmetic (doc_id % 3 links,
    * targets (7·doc_id + 13j) mod 1000), so the oracle re-derives every
    * edge INDEPENDENTLY of the regex chain — href, ordered link_idx,
    * and cleaned anchor text all pinned.
    */
  val textHtmlLinks = Q(
    (s, dir) => {
      import graft.text.Html
      val nlinks = (col("doc_id") % 3).cast("int")
      val anchors = when(nlinks > 0, array_join(
          transform(sequence(lit(0), nlinks - 1), j => {
            val tgt = (col("doc_id") * 7 + j * 13) % 1000
            concat(lit("<a href=\"http://example.com/doc/"), tgt,
              lit("\">see doc "), tgt, lit("</a>"))
          }), ""))
        .otherwise(lit(""))
      val h = t(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("html", concat(
          lit("<html><body><p>"), col("text"), lit("</p>"), anchors,
          lit("</body></html>")))
      Html.extractLinks(h, "doc_id", "html")
    },
    Some("SELECT doc_id, CAST(j AS INT) AS link_idx, " +
      "'http://example.com/doc/' || CAST((doc_id * 7 + 13 * j) % 1000 AS VARCHAR) AS href, " +
      "'see doc ' || CAST((doc_id * 7 + 13 * j) % 1000 AS VARCHAR) AS anchor " +
      "FROM documents, generate_series(0, 1) AS g(j) WHERE j < doc_id % 3"))

  /** Mojibake repair ([[graft.functions.RepairMojibake]], the ftfy
    * transform): accents planted for doc_id % 3 = 0, the text mangled
    * through a REAL UTF-8-read-as-Latin-1 round trip
    * (`decode(encode(p, 'UTF-8'), 'ISO-8859-1')`), then repaired by the
    * native expression. The oracle never sees the mangling — it derives
    * the expected repaired text and detection flag straight from the
    * base table, so the repair must be byte-exact to hash-match.
    */
  val textFixMojibake = Q(
    (s, dir) => {
      import graft.functions.RepairMojibake.repairMojibake
      val planted = when(col("doc_id") % 3 === 0,
        replace(col("text"), lit("a"), lit("ä"))).otherwise(col("text"))
      t(s, dir, "documents").select(col("doc_id"), planted.as("p"))
        .withColumn("moji", decode(encode(col("p"), "UTF-8"), "ISO-8859-1"))
        .select(col("doc_id"),
          repairMojibake(col("moji")).as("text"),
          (repairMojibake(col("moji")) =!= col("moji")).as("was_mojibake"))
    },
    Some("SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN " +
      "replace(text, 'a', 'ä') ELSE text END AS text, " +
      "doc_id % 3 = 0 AND text LIKE '%a%' AS was_mojibake FROM documents"))

  /** The full CRAWL loop as ONE executed pipeline: WARC segments →
    * HTTP-response scan → per-page domain → anchor extraction
    * ([[graft.text.Html.extractLinks]]) → distinct domain edge list →
    * 5 damped PageRank iterations ([[graft.graph.PageRank]]) — the
    * crawl-prioritization composite a web-corpus curator actually
    * runs. Anchors are planted off doc_id arithmetic, so the oracle
    * derives the edge list WITHOUT parsing anything and unrolls the
    * rank iterations in SQL; a single mis-parsed record anywhere in
    * the WARC/HTML chain shifts a rank and breaks the hash.
    */
  val corpusCrawlPagerank = Q(
    (s, dir) => {
      import graft.text.{Html, WebCuration}
      val nlinks = (col("doc_id") % 3).cast("int")
      val anchors = when(nlinks > 0, array_join(
          transform(sequence(lit(0), nlinks - 1), j => {
            val dom = (col("doc_id") * 7 + j * 13) % 20
            val tgt = (col("doc_id") * 11 + j) % 1000
            concat(lit("<a href=\"http://src"), dom, lit(".example.com/doc/"),
              tgt, lit("\">see "), tgt, lit("</a>"))
          }), ""))
        .otherwise(lit(""))
      val pages = t(s, dir, "documents").select(
        concat(lit("http://"), col("source"), lit(".example.com/doc/"),
          col("doc_id")).as("uri"),
        concat(lit("<html><body><p>"), col("text"), lit("</p>"), anchors,
          lit("</body></html>")).as("body"))
      val tmp = EntriesDedup.cachedWarcFixture(dir, "html")(pages)
      val recs = Warc.read(s, s"$tmp/*.warc.gz")
        .where(col("warc_type") === "response")
        .select(col("target_uri"), col("payload").cast("string").as("html"))
      val edges = Html.extractLinks(
          WebCuration.withDomain(recs, "target_uri", "src")
            .select(col("src"), col("html")), "src", "html")
        .select(col("src"), lower(regexp_extract(col("href"),
          WebCuration.DomainPattern, 1)).as("dst"))
        .distinct()
      graft.graph.PageRank.pagerank(edges, "src", "dst", iters = 5)
    },
    Some(("WITH e AS (SELECT DISTINCT source || '.example.com' AS src, 'src' || CAST((doc_id * 7 + 13 * j) % 20 AS VARCHAR) || '.example.com' AS dst FROM documents, generate_series(0, 1) AS g(j) WHERE j < doc_id % 3), " +
      "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)), " +
      "nn AS (SELECT count(*) AS n FROM nodes), " +
      "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1), " +
      "r0 AS (SELECT node, round(1.0 / n, 9) AS rank FROM nodes, nn), " +
      (1 to 5).map(k =>
        s"r$k AS (SELECT n2.node, round((1.0 - 0.85) / nn.n + 0.85 * COALESCE(s.mass, 0), 9) AS rank " +
          s"FROM nodes n2 CROSS JOIN nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank / d.deg) AS mass " +
          s"FROM e JOIN r${k - 1} r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY 1) s ON s.node = n2.node)")
        .mkString(", ") +
      " SELECT node, rank FROM r5")))

  /** The full GD training replay shared by `text_quality_model` and
    * `pref_best_of_n`: every CTE through `mf` (per-doc final margin) —
    * 3 iterations of quantized full-batch logistic regression in SQL.
    */
  val qmGdCtes: String =
    ("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y FROM documents WHERE trim(text) <> ''), " +
      "bk AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 6) AS BIGINT) % 64 AS bucket, len(ws) AS nt FROM (SELECT doc_id, unnest(ws) AS w, ws FROM tk)), " +
      "f0 AS (SELECT doc_id, bucket, round(count(*) * 1.0 / any_value(nt), 9) AS x FROM bk GROUP BY doc_id, bucket UNION ALL SELECT doc_id, CAST(-1 AS BIGINT), 1.0 FROM tk), " +
      "lab AS (SELECT doc_id, y FROM tk), nn AS (SELECT count(*) AS n FROM lab), " +
      "g1 AS (SELECT bucket, round(sum(x * (0.5 - y)) / any_value(n), 9) AS g FROM f0 JOIN lab USING (doc_id) CROSS JOIN nn GROUP BY bucket), " +
      "w1 AS (SELECT bucket, round(-0.5 * g, 9) AS w FROM g1), " +
      (2 to 3).map(k =>
        s"m$k AS (SELECT doc_id, round(sum(x * w), 9) AS m FROM f0 JOIN w${k - 1} USING (bucket) GROUP BY doc_id), " +
          s"e$k AS (SELECT m$k.doc_id, round(1.0 / (1.0 + exp(-m)), 9) - y AS err FROM m$k JOIN lab USING (doc_id)), " +
          s"g$k AS (SELECT bucket, round(sum(x * err) / any_value(n), 9) AS g FROM f0 JOIN e$k USING (doc_id) CROSS JOIN nn GROUP BY bucket), " +
          s"w$k AS (SELECT bucket, round(w - 0.5 * g, 9) AS w FROM w${k - 1} JOIN g$k USING (bucket))")
        .mkString(", ") +
      ", mf AS (SELECT doc_id, round(sum(x * w), 9) AS m FROM f0 JOIN w3 USING (bucket) GROUP BY doc_id)")

  /** Trained quality classifier ([[graft.text.QualityModel]]): hashed
    * bag-of-words logistic regression, 3 full-batch GD iterations from
    * w₀ = 0 with every floating hand-off quantized to 9 decimals — so
    * the oracle UNROLLS THE ENTIRE TRAINING RUN in SQL (per-iteration
    * gradient → weight → margin CTEs, the PageRank discipline) and the
    * final probabilities must match to the hash. Silver label:
    * lang = 'en'.
    */
  val textQualityModel = Q(
    (s, dir) => graft.text.QualityModel.trainAndScore(
        t(s, dir, "documents"), "doc_id", "text", col("lang") === "en",
        buckets = 64, iters = 3, lr = 0.5)
      .select(col("id").as("doc_id"), col("prob"), col("predicted")),
    Some(qmGdCtes +
      " SELECT doc_id, round(1.0 / (1.0 + exp(-m)), 4) AS prob, round(1.0 / (1.0 + exp(-m)), 4) >= 0.5 AS predicted FROM mf"))

  /** Bradley–Terry strength ratings ([[graft.operators.Rating
    * .bradleyTerry]]) over the DPO pair fixture: the four response
    * slots act as the "policies" being compared, every surviving
    * (chosen, rejected) pair is one game, and two MM iterations from
    * the all-ones start turn the win/loss log into per-slot strength
    * scores — the aggregation that ranks model variants (or judges) in
    * a preference pipeline. The oracle replays both MM iterations
    * (game matrix → per-player denominators → W_i/den), so the rating
    * arithmetic — not just the pair derivation — is pinned.
    */
  val prefBradleyTerry = Q(
    (s, dir) => graft.operators.Rating.bradleyTerry(
      graft.text.Pref.preferencePairs(
        t(s, dir, "documents").where(pmod(col("doc_id"), lit(29)) =!= 0)
          .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
            pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
            length(col("text")).as("sc")),
        "prompt", "rid", "text", "sc", minMargin = 3.0)
        .select(col("chosen_id"), col("rejected_id")),
      "chosen_id", "rejected_id", iters = 2),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, resp_id AS w, t AS ct, sc AS cs, n FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, resp_id AS l, t AS rt, sc AS rs FROM rk WHERE rb = 1), " +
      "pw AS (SELECT w, l FROM ch JOIN rj USING (prompt_id) WHERE n >= 2 AND cs - rs >= 3.0 AND ct <> rt), " +
      "g AS (SELECT w, l, count(*) AS c FROM pw GROUP BY 1, 2), " +
      "nn AS (SELECT i, j, sum(n) AS n FROM (SELECT w AS i, l AS j, c AS n FROM g UNION ALL SELECT l AS i, w AS j, c AS n FROM g) GROUP BY 1, 2), " +
      "wi AS (SELECT w AS i, sum(c) AS wtot FROM g GROUP BY 1), " +
      "r0 AS (SELECT DISTINCT i, 1.0 AS r FROM nn), " +
      "r1 AS (SELECT d.i, COALESCE(wi.wtot, 0) / d.den AS r FROM (SELECT nn.i, sum(nn.n / (ri.r + rj.r)) AS den FROM nn JOIN r0 ri ON ri.i = nn.i JOIN r0 rj ON rj.i = nn.j GROUP BY nn.i) d LEFT JOIN wi ON wi.i = d.i), " +
      "r2 AS (SELECT d.i, COALESCE(wi.wtot, 0) / d.den AS r FROM (SELECT nn.i, sum(nn.n / (ri.r + rj.r)) AS den FROM nn JOIN r1 ri ON ri.i = nn.i JOIN r1 rj ON rj.i = nn.j GROUP BY nn.i) d LEFT JOIN wi ON wi.i = d.i) " +
      "SELECT i AS player, round(r, 6) AS rating FROM r2"))

  /** Pairwise win-rate matrix ([[graft.operators.Rating.winMatrix]]):
    * the raw head-to-head table beside the BT leaderboard — per
    * matchup, games, empirical rate, Wilson 95% interval, and the
    * straddles-0.5 "unresolved" flag an active-sampling loop feeds
    * on. Oracle replays the pair derivation, the matchup fold, and
    * the Wilson arithmetic.
    */
  val prefWinMatrix = Q(
    (s, dir) => graft.operators.Rating.winMatrix(
      graft.text.Pref.preferencePairs(
        t(s, dir, "documents").where(pmod(col("doc_id"), lit(29)) =!= 0)
          .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
            pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
            length(col("text")).as("sc")),
        "prompt", "rid", "text", "sc", minMargin = 3.0)
        .select(col("chosen_id"), col("rejected_id")),
      "chosen_id", "rejected_id"),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, resp_id AS w, t AS ct, sc AS cs, n FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, resp_id AS l, t AS rt, sc AS rs FROM rk WHERE rb = 1), " +
      "pw AS (SELECT w, l FROM ch JOIN rj USING (prompt_id) WHERE n >= 2 AND cs - rs >= 3.0 AND ct <> rt), " +
      "g AS (SELECT w, l, count(*) AS c FROM pw GROUP BY 1, 2), " +
      "mm AS (SELECT least(w, l) AS i, greatest(w, l) AS j, CAST(sum(CASE WHEN w < l THEN c ELSE 0 END) AS BIGINT) AS wins_i, CAST(sum(c) AS BIGINT) AS n_games FROM g GROUP BY 1, 2), " +
      "wa AS (SELECT *, CAST(n_games AS DOUBLE) AS nd, wins_i / CAST(n_games AS DOUBLE) AS p FROM mm), " +
      "wb AS (SELECT i, j, n_games, wins_i, p, (p + (1.96 * 1.96) / (2.0 * nd)) / (1.0 + (1.96 * 1.96) / nd) AS ctr, 1.96 * sqrt(p * (1.0 - p) / nd + (1.96 * 1.96) / (4.0 * nd * nd)) / (1.0 + (1.96 * 1.96) / nd) AS hf FROM wa) " +
      "SELECT i, j, n_games, wins_i, round(p, 4) AS p_emp, round(ctr - hf, 4) AS wilson_lo, round(ctr + hf, 4) AS wilson_hi, round(ctr - hf, 4) <= 0.5 AND round(ctr + hf, 4) >= 0.5 AS unresolved FROM wb"))

  /** Bradley–Terry calibration ([[graft.operators.Rating
    * .btCalibration]]) over the same pair fixture: matchups bucketed
    * by the model's predicted win probability (from the PUBLISHED
    * rounded ratings) vs their empirical win fractions — the
    * reliability diagram beside the leaderboard. The oracle replays
    * the full chain: pair derivation, both MM iterations, the matchup
    * fold, and the bucket arithmetic.
    */
  val prefBtCalibration = Q(
    (s, dir) => graft.operators.Rating.btCalibration(
      graft.text.Pref.preferencePairs(
        t(s, dir, "documents").where(pmod(col("doc_id"), lit(29)) =!= 0)
          .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
            pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
            length(col("text")).as("sc")),
        "prompt", "rid", "text", "sc", minMargin = 3.0)
        .select(col("chosen_id"), col("rejected_id")),
      "chosen_id", "rejected_id", iters = 2, buckets = 10),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, resp_id AS w, t AS ct, sc AS cs, n FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, resp_id AS l, t AS rt, sc AS rs FROM rk WHERE rb = 1), " +
      "pw AS (SELECT w, l FROM ch JOIN rj USING (prompt_id) WHERE n >= 2 AND cs - rs >= 3.0 AND ct <> rt), " +
      "g AS (SELECT w, l, count(*) AS c FROM pw GROUP BY 1, 2), " +
      "nn AS (SELECT i, j, sum(n) AS n FROM (SELECT w AS i, l AS j, c AS n FROM g UNION ALL SELECT l AS i, w AS j, c AS n FROM g) GROUP BY 1, 2), " +
      "wi AS (SELECT w AS i, sum(c) AS wtot FROM g GROUP BY 1), " +
      "r0 AS (SELECT DISTINCT i, 1.0 AS r FROM nn), " +
      "r1 AS (SELECT d.i, COALESCE(wi.wtot, 0) / d.den AS r FROM (SELECT nn.i, sum(nn.n / (ri.r + rj.r)) AS den FROM nn JOIN r0 ri ON ri.i = nn.i JOIN r0 rj ON rj.i = nn.j GROUP BY nn.i) d LEFT JOIN wi ON wi.i = d.i), " +
      "r2 AS (SELECT d.i, COALESCE(wi.wtot, 0) / d.den AS r FROM (SELECT nn.i, sum(nn.n / (ri.r + rj.r)) AS den FROM nn JOIN r1 ri ON ri.i = nn.i JOIN r1 rj ON rj.i = nn.j GROUP BY nn.i) d LEFT JOIN wi ON wi.i = d.i), " +
      "rr AS (SELECT i AS player, round(r, 6) AS rating FROM r2), " +
      "mm AS (SELECT least(w, l) AS i, greatest(w, l) AS j, sum(CASE WHEN w < l THEN c ELSE 0 END) AS wins_i, sum(c) AS n FROM g GROUP BY 1, 2), " +
      "sc AS (SELECT mm.i, mm.j, mm.wins_i, mm.n, ri.rating / (ri.rating + rj.rating) AS p FROM mm JOIN rr ri ON ri.player = mm.i JOIN rr rj ON rj.player = mm.j) " +
      "SELECT CAST(least(floor(p * 10), 9) AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n_matchups, CAST(sum(n) AS BIGINT) AS n_games, round(sum(p * n) / sum(n), 4) AS p_pred, round(CAST(sum(wins_i) AS DOUBLE) / sum(n), 4) AS p_emp FROM sc GROUP BY 1"))

  /** Annotation majority vote ([[graft.operators.Annotations
    * .majorityVote]]): five deterministic synthetic annotators label
    * every document ('bad'/'good'/'ok' off a (n_chars, annotator,
    * doc_id) residue), and the aggregate reports the consensus label,
    * agreement fraction, and unanimity — the rater-aggregation step
    * between raw labels and a training set, with the modal tie broken
    * to the LOWER label on both sides.
    */
  val prefMajorityVote = Q(
    (s, dir) => graft.operators.Annotations.majorityVote(
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(4))).as("a"))
        .select(col("doc_id"),
          element_at(array(lit("bad"), lit("good"), lit("ok")),
            (pmod(col("n_chars") + col("a") * (col("doc_id") + 1), lit(3))
              + 1).cast("int")).as("lab")),
      "doc_id", "lab"),
    Some("WITH l AS (SELECT doc_id, ['bad','good','ok'][CAST((n_chars + t.a * (doc_id + 1)) % 3 + 1 AS INT)] AS lab FROM documents CROSS JOIN generate_series(0, 4) t(a)), " +
      "pl AS (SELECT doc_id, lab, count(*) AS c FROM l GROUP BY 1, 2), " +
      "v AS (SELECT doc_id, lab AS vote, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lab) AS rn FROM pl), " +
      "a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_annotations, CAST(max(c) AS BIGINT) AS n_agree FROM pl GROUP BY 1) " +
      "SELECT a.doc_id AS item, v.vote, n_annotations, n_agree, round(n_agree * 1.0 / n_annotations, 4) AS agreement, n_agree = n_annotations AS unanimous FROM a JOIN v ON v.doc_id = a.doc_id AND v.rn = 1"))

  /** Length-bias audit ([[graft.text.Pref.lengthBias]]): the
    * reward-hacking check over derived preference pairs — pairs bucket
    * by the sign of the chosen−rejected token-count delta, with pair
    * shares and mean margins per bucket. The fixture scores by
    * `n_chars % 97` (a pseudo-quality DECORRELATED from length, so all
    * three buckets populate); the oracle re-derives the pair extremes
    * with the (score, resp_id) row_number twin and the same
    * whitespace token count.
    */
  val prefLengthBias = Q(
    (s, dir) => graft.text.Pref.lengthBias(
      t(s, dir, "documents")
        .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
          pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
          pmod(col("n_chars"), lit(97)).as("sc")),
      "prompt", "rid", "text", "sc", minMargin = 3.0),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(n_chars % 97 AS DOUBLE) AS sc, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS tk FROM documents), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, t AS ct, sc AS cs, tk AS ctk, n FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, t AS rt, sc AS rs, tk AS rtk FROM rk WHERE rb = 1), " +
      "pw AS (SELECT ctk - rtk AS d, cs - rs AS m FROM ch JOIN rj USING (prompt_id) WHERE n >= 2 AND cs - rs >= 3.0 AND ct <> rt), " +
      "b AS (SELECT CASE WHEN d > 0 THEN 'chosen_longer' WHEN d < 0 THEN 'rejected_longer' ELSE 'equal_length' END AS bucket, count(*) AS n_pairs, round(avg(d), 4) AS avg_len_delta, round(avg(m), 4) AS avg_margin FROM pw GROUP BY 1), " +
      "tt AS (SELECT sum(n_pairs) AS tot FROM b) " +
      "SELECT bucket, n_pairs, round(n_pairs * 1.0 / tot, 6) AS frac, avg_len_delta, avg_margin FROM b CROSS JOIN tt"))

  /** Fleiss' kappa ([[graft.operators.Annotations.fleissKappa]]) over
    * the SAME synthetic five-annotator label log as
    * `pref_majority_vote` — chance-corrected agreement for the whole
    * campaign in one row, the ship-or-re-brief signal raw agreement
    * can't give on a skewed label marginal. The oracle re-derives the
    * item×label cells, per-item P_i, assignment-weighted marginals,
    * and the (P̄−P_e)/(1−P_e) fold.
    */
  val prefFleissKappa = Q(
    (s, dir) => graft.operators.Annotations.fleissKappa(
      t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          explode(sequence(lit(0), lit(4))).as("a"))
        .select(col("doc_id"),
          element_at(array(lit("bad"), lit("good"), lit("ok")),
            (pmod(col("n_chars") + col("a") * (col("doc_id") + 1), lit(3))
              + 1).cast("int")).as("lab")),
      "doc_id", "lab"),
    Some("WITH l AS (SELECT doc_id, ['bad','good','ok'][CAST((n_chars + t.a * (doc_id + 1)) % 3 + 1 AS INT)] AS lab FROM documents CROSS JOIN generate_series(0, 4) t(a)), " +
      "cell AS (SELECT doc_id, lab, count(*) AS c FROM l GROUP BY 1, 2), " +
      "it AS (SELECT doc_id, sum(c) AS n, sum(c * c) AS s2 FROM cell GROUP BY 1 HAVING sum(c) >= 2), " +
      "pb AS (SELECT count(*) AS n_items, CAST(sum(n) AS BIGINT) AS n_ratings, avg((s2 - n) * 1.0 / (n * (n - 1))) AS pb FROM it), " +
      "pj AS (SELECT lab, sum(c) AS cj FROM cell JOIN it USING (doc_id) GROUP BY 1), " +
      "pe AS (SELECT count(*) AS n_categories, sum(cj * cj) * 1.0 / (sum(cj) * sum(cj)) AS pe FROM pj) " +
      "SELECT n_items, n_ratings, n_categories, round(pb, 6) AS p_bar, round(pe, 6) AS p_e, round((pb - pe) / (1 - pe), 6) AS kappa FROM pb CROSS JOIN pe"))

  /** Best-of-N rejection sampling driven by the TRAINED quality model
    * ([[graft.text.Pref.bestOfN]] over [[graft.text.QualityModel
    * .trainAndScore]] probabilities): documents pooled
    * four-per-prompt, each pool collapsed to its top-probability
    * candidate — the Llama-2-style iterative-SFT selection step as one
    * composite. The oracle replays the ENTIRE distributed GD run (the
    * shared `qmGdCtes` replay) and then re-derives the per-prompt
    * argmax with the (prob, resp_id) tie-break. Blank documents drop
    * in training on both sides, so pool sizes shrink consistently.
    */
  val prefBestOfN = Q(
    (s, dir) => {
      val scored = graft.text.QualityModel.trainAndScore(
          t(s, dir, "documents"), "doc_id", "text", col("lang") === "en",
          buckets = 64, iters = 3, lr = 0.5)
        .select(floor(col("id") / 4).cast("long").as("prompt"),
          pmod(col("id"), lit(4)).as("rid"), col("prob"))
      graft.text.Pref.bestOfN(scored, "prompt", "rid", "prob")
    },
    Some(qmGdCtes +
      ", sc AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, round(1.0 / (1.0 + exp(-m)), 4) AS prob FROM mf), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY prob DESC, resp_id DESC) AS r, count(*) OVER (PARTITION BY prompt_id) AS n FROM sc) " +
      "SELECT prompt_id, resp_id AS best_id, prob AS best_score, CAST(n AS BIGINT) AS n_responses FROM rk WHERE r = 1"))

  /** robots.txt compliance filter ([[graft.text.Robots]], RFC 9309):
    * per-domain robots bodies are planted with agent groups, prefix
    * rules, a wildcard+anchor rule, and a blanket-deny fallback group;
    * the engine PARSES and evaluates them (exact-group precedence,
    * longest-match, Allow-wins-ties, `*`/`$` matching), while the
    * oracle derives every verdict from the planting arithmetic alone.
    */
  val webRobotsFilter = Q(
    (s, dir) => {
      import graft.text.Robots
      val k = (col("doc_id") % 20).cast("int")
      val m = (col("doc_id") % 5).cast("int")
      val docs = t(s, dir, "documents")
      val robots = docs.select(col("source")).distinct()
        .withColumn("__k",
          regexp_extract(col("source"), "src(\\d+)", 1).cast("int"))
        .select(concat(col("source"), lit(".example.com")).as("domain"),
          when(col("__k") % 4 === 0,
            lit("User-agent: *\nDisallow: /"))
            .otherwise(lit("User-agent: graftbot\nDisallow: /private\n" +
              "Allow: /private/ok\nDisallow: /*.zip$\n\n" +
              "User-agent: *\nDisallow: /")).as("txt"))
      val urls = docs.select(col("doc_id"),
        concat(lit("http://src"), k, lit(".example.com"),
          when(m === 0, concat(lit("/public/x"), col("doc_id")))
            .when(m === 1, concat(lit("/private/x"), col("doc_id")))
            .when(m === 2, concat(lit("/private/ok/x"), col("doc_id")))
            .when(m === 3, concat(lit("/files/a"), col("doc_id"), lit(".zip")))
            .otherwise(lit("/private"))).as("url"))
      Robots.withAllowed(urls, "url",
        Robots.rules(robots, "domain", "txt", "graftbot"))
    },
    Some("SELECT doc_id, 'http://src' || CAST(doc_id % 20 AS VARCHAR) || " +
      "'.example.com' || CASE CAST(doc_id % 5 AS INT) " +
      "WHEN 0 THEN '/public/x' || CAST(doc_id AS VARCHAR) " +
      "WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR) " +
      "WHEN 2 THEN '/private/ok/x' || CAST(doc_id AS VARCHAR) " +
      "WHEN 3 THEN '/files/a' || CAST(doc_id AS VARCHAR) || '.zip' " +
      "ELSE '/private' END AS url, " +
      "CASE WHEN (doc_id % 20) % 4 = 0 THEN false " +
      "ELSE CAST(doc_id % 5 AS INT) IN (0, 2) END AS allowed " +
      "FROM documents"))

  /** SFT chat-template rendering ([[graft.text.Chat]]): documents
    * grouped four-per-conversation as alternating user/assistant
    * turns, rendered to one training sequence per conversation with
    * ASSISTANT-ONLY loss spans — the half-open character ranges a
    * trainer masks loss to. The oracle re-derives the running-sum
    * offsets and every span boundary; an off-by-one silently trains on
    * user text, which is exactly what the hash would catch.
    */
  val chatTemplateRender = Q(
    (s, dir) => {
      val turns = t(s, dir, "documents").select(
        floor(col("doc_id") / 4).cast("long").as("conv"),
        pmod(col("doc_id"), lit(4)).as("i"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        col("text").as("txt"))
      graft.text.Chat.renderWithLossSpans(turns, "conv", "i", "role", "txt")
    },
    Some("WITH tu AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx, CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, text AS t FROM documents), " +
      "r AS (SELECT conv_id, turn_idx, role, t, '<|' || role || '|>' || t || '<|end|>' AS r FROM tu), " +
      "o AS (SELECT *, COALESCE(sum(length(r)) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM r), " +
      "asm AS (SELECT conv_id, string_agg(r, '' ORDER BY turn_idx) AS text FROM o GROUP BY 1), " +
      "sp AS (SELECT conv_id, turn_idx AS span_turn, CAST(off + length(role) + 4 AS BIGINT) AS s, CAST(off + length(role) + 4 + length(t) AS BIGINT) AS e FROM o WHERE role = 'assistant') " +
      "SELECT asm.conv_id, asm.text, sp.span_turn, sp.s, sp.e FROM asm LEFT JOIN sp USING (conv_id)"))

  /** SFT from a BRANCHING conversation store — the composite a real
    * assistant-data pipeline runs: [[graft.graph.TreePaths.rootPaths]]
    * linearizes a heap-shaped message forest (8-message trees over
    * documents), leaves (messages nobody replied to) select the
    * trainable threads, each root→leaf path explodes into ordered
    * turns with depth-alternating roles, and [[graft.text.Chat
    * .renderWithLossSpans]] renders them with assistant loss spans.
    * The oracle replays the walk with a recursive CTE, the leaf
    * anti-filter, the path explode, and the render arithmetic
    * (BIGINT-cast spans, the `pref_dpo_render` convention).
    */
  val sftTreeRender = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 120)
      val conv = floor(col("doc_id") / 8).cast("long")
      val local = pmod(col("doc_id"), lit(8))
      val msgs = docs.select(col("doc_id"), col("text"),
        when(local === 0, lit(null).cast("long"))
          .otherwise(conv * 8 + floor((local - 1) / 2).cast("long"))
          .as("parent"))
      val paths = graft.graph.TreePaths.rootPaths(msgs, "doc_id", "parent")
      val leaves = paths.join(
        msgs.select(col("parent").as("node"))
          .where(col("node").isNotNull).distinct(),
        Seq("node"), "left_anti")
      val turns = leaves
        .select(col("node").as("conv"),
          posexplode(split(col("path"), "/")))
        .select(col("conv"), col("pos").cast("long").as("i"),
          when(pmod(col("pos"), lit(2)) === 0, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          col("col").cast("long").as("msg_id"))
        .join(docs.select(col("doc_id").as("msg_id"),
          col("text").as("txt")), Seq("msg_id"))
      graft.text.Chat.renderWithLossSpans(turns, "conv", "i", "role", "txt")
    },
    Some("WITH RECURSIVE msg AS (SELECT doc_id, text, CASE WHEN doc_id % 8 = 0 THEN NULL ELSE (doc_id // 8) * 8 + (doc_id % 8 - 1) // 2 END AS parent FROM documents WHERE doc_id < 120), " +
      "walk AS (SELECT doc_id AS node, doc_id AS cur, CAST(doc_id AS VARCHAR) AS path FROM msg " +
      "UNION ALL SELECT w.node, p.parent AS cur, CAST(p.parent AS VARCHAR) || '/' || w.path AS path FROM walk w JOIN msg p ON p.doc_id = w.cur WHERE p.parent IS NOT NULL), " +
      "full_p AS (SELECT w.node, w.path FROM walk w JOIN msg m ON m.doc_id = w.cur WHERE m.parent IS NULL), " +
      "leaves AS (SELECT node, path FROM full_p WHERE node NOT IN (SELECT parent FROM msg WHERE parent IS NOT NULL)), " +
      "ex AS (SELECT node, unnest(string_split(path, '/')) AS mid, generate_subscripts(string_split(path, '/'), 1) AS i FROM leaves), " +
      "tu AS (SELECT x.node AS conv_id, CAST(x.i - 1 AS BIGINT) AS turn_idx, CASE WHEN (x.i - 1) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, d.text AS t FROM ex x JOIN msg d ON d.doc_id = CAST(x.mid AS BIGINT)), " +
      "r AS (SELECT conv_id, turn_idx, role, t, '<|' || role || '|>' || t || '<|end|>' AS r FROM tu), " +
      "o AS (SELECT *, COALESCE(sum(length(r)) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM r), " +
      "asm AS (SELECT conv_id, string_agg(r, '' ORDER BY turn_idx) AS text FROM o GROUP BY 1), " +
      "sp AS (SELECT conv_id, turn_idx AS span_turn, CAST(off + length(role) + 4 AS BIGINT) AS s, CAST(off + length(role) + 4 + length(t) AS BIGINT) AS e FROM o WHERE role = 'assistant') " +
      "SELECT asm.conv_id, asm.text, sp.span_turn, sp.s, sp.e FROM asm LEFT JOIN sp USING (conv_id)"))

  /** Char-span → token-span conversion: trainers mask loss in TOKEN
    * indices, not characters, so the rendered conversations' [s, e)
    * char spans convert to inclusive whitespace-token index ranges —
    * token index of a position = tokens in the prefix up to it minus
    * one (positions inside a token resolve to that token). Pure
    * per-row prefix token counts over the `chat_template_render`
    * output (the native [[graft.functions.TokenCount]] when
    * registered); the oracle re-derives both prefix counts from the
    * same render CTEs.
    */
  val sftTokenSpans = Q(
    (s, dir) => {
      val turns = t(s, dir, "documents").select(
        floor(col("doc_id") / 4).cast("long").as("conv"),
        pmod(col("doc_id"), lit(4)).as("i"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("user"))
          .otherwise(lit("assistant")).as("role"),
        col("text").as("txt"))
      val tokAt = (p: org.apache.spark.sql.Column) =>
        (graft.text.TextAnalysis.tokenCount(
          col("text").substr(lit(1), p.cast("int"))) - 1).cast("long")
      graft.text.Chat.renderWithLossSpans(turns, "conv", "i", "role", "txt")
        .where(col("span_turn").isNotNull)
        .select(col("conv_id"), col("span_turn"),
          tokAt(col("s")).as("tok_s"), tokAt(col("e")).as("tok_e"))
    },
    Some("WITH tu AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx, CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role, text AS t FROM documents), " +
      "r AS (SELECT conv_id, turn_idx, role, t, '<|' || role || '|>' || t || '<|end|>' AS r FROM tu), " +
      "o AS (SELECT *, COALESCE(sum(length(r)) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM r), " +
      "asm AS (SELECT conv_id, string_agg(r, '' ORDER BY turn_idx) AS text FROM o GROUP BY 1), " +
      "sp AS (SELECT conv_id, turn_idx AS span_turn, off + length(role) + 4 AS s, off + length(role) + 4 + length(t) AS e FROM o WHERE role = 'assistant') " +
      "SELECT asm.conv_id, sp.span_turn, " +
      "CAST(len(string_split_regex(lower(trim(substr(asm.text, 1, CAST(sp.s AS INT)))), '\\s+')) - 1 AS BIGINT) AS tok_s, " +
      "CAST(len(string_split_regex(lower(trim(substr(asm.text, 1, CAST(sp.e AS INT)))), '\\s+')) - 1 AS BIGINT) AS tok_e " +
      "FROM asm JOIN sp USING (conv_id)"))

  /** Turn-structure audit ([[graft.text.Chat.alternationAudit]]) — the
    * validity gate ahead of rendering: defects planted off doc_id
    * residues (role flips at doc_id % 37 = 0, all-user conversations
    * at conv % 53 = 0, missing turns at doc_id % 41 = 0 creating index
    * gaps), each flag re-derived by the oracle's lag windows.
    */
  val chatAlternationAudit = Q(
    (s, dir) => {
      val base = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(41)) =!= 0)
        .select(
          floor(col("doc_id") / 4).cast("long").as("conv"),
          pmod(col("doc_id"), lit(4)).as("i"),
          col("doc_id"))
      val parity = when(pmod(col("doc_id"), lit(2)) === 0, lit("user"))
        .otherwise(lit("assistant"))
      val flipped = when(pmod(col("doc_id"), lit(2)) === 0, lit("assistant"))
        .otherwise(lit("user"))
      val turns = base.select(col("conv"), col("i"),
        when(pmod(col("conv"), lit(53)) === 0, lit("user"))
          .otherwise(when(pmod(col("doc_id"), lit(37)) === 0, flipped)
            .otherwise(parity)).as("role"))
      graft.text.Chat.alternationAudit(turns, "conv", "i", "role")
    },
    Some("WITH tu AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx, CASE WHEN (doc_id // 4) % 53 = 0 THEN 'user' WHEN doc_id % 37 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'assistant' ELSE 'user' END) ELSE (CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END) END AS role FROM documents WHERE doc_id % 41 <> 0), " +
      "l AS (SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role, lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx FROM tu) " +
      "SELECT conv_id, arg_min(role, turn_idx) <> 'user' AS bad_opening, " +
      "COALESCE(max(CASE WHEN prev_role = role THEN 1 ELSE 0 END), 0) = 1 AS repeated_role, " +
      "sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) = 0 AS no_assistant, " +
      "COALESCE(max(CASE WHEN prev_idx IS NOT NULL AND turn_idx <> prev_idx + 1 THEN 1 ELSE 0 END), 0) = 1 AS index_gap " +
      "FROM l GROUP BY 1"))

  /** The gated SFT render — audit → drop defective conversations →
    * render, the composite an SFT pipeline actually runs
    * ([[graft.text.Chat.alternationAudit]] feeding
    * [[graft.text.Chat.renderWithLossSpans]], the same chaining shape
    * `pref_dpo_render` uses for pairs → render). The fixture is
    * `chat_alternation_audit`'s defect-planted corpus (role flips at
    * doc_id % 37, all-user conversations at conv % 53, index gaps from
    * the % 41 turn drop), so the gate is load-bearing: defective
    * conversations visibly vanish from the rendered output, and the
    * oracle re-derives the audit flags AND the span arithmetic in one
    * query — a wrong flag OR a wrong offset flips the hash.
    */
  val sftRenderGated = Q(
    (s, dir) => {
      val base = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(41)) =!= 0)
        .select(
          floor(col("doc_id") / 4).cast("long").as("conv"),
          pmod(col("doc_id"), lit(4)).as("i"),
          col("doc_id"), col("text"))
      val parity = when(pmod(col("doc_id"), lit(2)) === 0, lit("user"))
        .otherwise(lit("assistant"))
      val flipped = when(pmod(col("doc_id"), lit(2)) === 0, lit("assistant"))
        .otherwise(lit("user"))
      val turns = base.select(col("conv"), col("i"),
        when(pmod(col("conv"), lit(53)) === 0, lit("user"))
          .otherwise(when(pmod(col("doc_id"), lit(37)) === 0, flipped)
            .otherwise(parity)).as("role"),
        col("text").as("txt"))
      val valid = graft.text.Chat.alternationAudit(turns, "conv", "i", "role")
        .where(!col("bad_opening") && !col("repeated_role") &&
          !col("no_assistant") && !col("index_gap"))
        .select(col("conv_id"))
      // conv-keyed equi-join: the audit aggregate and the render window
      // share the conversation key, so the gate adds no new shuffle key
      val gated = turns.join(valid, turns("conv") === valid("conv_id"))
        .select(col("conv"), col("i"), col("role"), col("txt"))
      graft.text.Chat.renderWithLossSpans(gated, "conv", "i", "role", "txt")
    },
    Some("WITH tu AS (SELECT doc_id // 4 AS conv_id, doc_id % 4 AS turn_idx, CASE WHEN (doc_id // 4) % 53 = 0 THEN 'user' WHEN doc_id % 37 = 0 THEN (CASE WHEN doc_id % 2 = 0 THEN 'assistant' ELSE 'user' END) ELSE (CASE WHEN doc_id % 2 = 0 THEN 'user' ELSE 'assistant' END) END AS role, text AS t FROM documents WHERE doc_id % 41 <> 0), " +
      "l AS (SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role, lag(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_idx FROM tu), " +
      "aud AS (SELECT conv_id, arg_min(role, turn_idx) <> 'user' AS bad_opening, COALESCE(max(CASE WHEN prev_role = role THEN 1 ELSE 0 END), 0) = 1 AS repeated_role, sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) = 0 AS no_assistant, COALESCE(max(CASE WHEN prev_idx IS NOT NULL AND turn_idx <> prev_idx + 1 THEN 1 ELSE 0 END), 0) = 1 AS index_gap FROM l GROUP BY 1), " +
      "ok AS (SELECT conv_id FROM aud WHERE NOT bad_opening AND NOT repeated_role AND NOT no_assistant AND NOT index_gap), " +
      "r AS (SELECT conv_id, turn_idx, role, t, '<|' || role || '|>' || t || '<|end|>' AS r FROM tu JOIN ok USING (conv_id)), " +
      "o AS (SELECT *, COALESCE(sum(length(r)) OVER (PARTITION BY conv_id ORDER BY turn_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM r), " +
      "asm AS (SELECT conv_id, string_agg(r, '' ORDER BY turn_idx) AS text FROM o GROUP BY 1), " +
      "sp AS (SELECT conv_id, turn_idx AS span_turn, CAST(off + length(role) + 4 AS BIGINT) AS s, CAST(off + length(role) + 4 + length(t) AS BIGINT) AS e FROM o WHERE role = 'assistant') " +
      "SELECT asm.conv_id, asm.text, sp.span_turn, sp.s, sp.e FROM asm LEFT JOIN sp USING (conv_id)"))

  /** DPO preference-pair construction ([[graft.text.Pref
    * .preferencePairs]]): documents pooled four-per-prompt as scored
    * candidates (score = text length), collapsed to deterministic
    * (chosen, rejected) pairs under the (score, resp_id) tie-break,
    * with a genuinely single-candidate prompt (prompt 13: doc_ids
    * 53–55 dropped, only resp 0 survives — the % 29 filter alone can
    * never shrink a contiguous 4-id pool below 3, so the
    * n_responses >= 2 gate needs this explicit plant to fire),
    * sub-margin pools, and identical-text pairs filtered. The oracle
    * re-derives both extremes with row_number windows — a divergent
    * tie-break or margin boundary flips rows and fails the hash.
    */
  val prefPairBuild = Q(
    (s, dir) => graft.text.Pref.preferencePairs(
      t(s, dir, "documents").where(pmod(col("doc_id"), lit(29)) =!= 0
          && !col("doc_id").between(53, 55))
        .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
          pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
          length(col("text")).as("sc")),
      "prompt", "rid", "text", "sc", minMargin = 3.0),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0 AND doc_id NOT BETWEEN 53 AND 55), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, resp_id AS chosen_id, t AS ct, sc AS cs, CAST(n AS BIGINT) AS n_responses FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, resp_id AS rejected_id, t AS rt, sc AS rs FROM rk WHERE rb = 1) " +
      "SELECT prompt_id, chosen_id, rejected_id, n_responses, round(cs - rs, 4) AS margin " +
      "FROM ch JOIN rj USING (prompt_id) " +
      "WHERE n_responses >= 2 AND cs - rs >= 3.0 AND ct <> rt"))

  /** Preference-pool validity audit ([[graft.text.Pref.pairAudit]]):
    * per prompt, the defect flags DPO curation reports — too_few,
    * zero_margin, degenerate_pair (tie-broken extremes carry identical
    * text), and top_ties (candidates sharing the top score, i.e.
    * "chosen" decided by tie-break alone). Length-valued scores make
    * ties and zero-margin pools organically dense in the fixture; the
    * prompt-13 plant (doc_ids 53–55 dropped) supplies the one genuine
    * too_few pool, which the % 29 filter alone cannot create.
    */
  val prefPairAudit = Q(
    (s, dir) => graft.text.Pref.pairAudit(
      t(s, dir, "documents").where(pmod(col("doc_id"), lit(29)) =!= 0
          && !col("doc_id").between(53, 55))
        .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
          pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
          length(col("text")).as("sc")),
      "prompt", "rid", "text", "sc"),
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0 AND doc_id NOT BETWEEN 53 AND 55), " +
      "w AS (SELECT *, max(sc) OVER (PARTITION BY prompt_id) AS mx, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb FROM r), " +
      "a AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_responses, count(*) < 2 AS too_few, max(sc) = min(sc) AS zero_margin, CAST(sum(CASE WHEN sc = mx THEN 1 ELSE 0 END) AS BIGINT) AS top_ties FROM w GROUP BY 1), " +
      "ch AS (SELECT prompt_id, t AS ct FROM w WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, t AS rt FROM w WHERE rb = 1) " +
      "SELECT a.prompt_id, n_responses, too_few, zero_margin, ct = rt AS degenerate_pair, top_ties FROM a JOIN ch USING (prompt_id) JOIN rj USING (prompt_id)"))

  /** DPO training rows — the preference tier's final artifact:
    * surviving (chosen, rejected) pairs rendered through the SFT chat
    * template ([[graft.text.Pref.preferencePairs]] ×
    * [[graft.text.Chat.renderWithLossSpans]]), two 2-turn
    * conversations per pair (conv = prompt·2 + {0 chosen, 1 rejected})
    * with assistant-only loss spans — exactly what a DPO trainer
    * consumes (sequence pairs + the spans the logprob difference is
    * taken over). The oracle composes the pair-selection windows with
    * the template's span arithmetic.
    */
  val prefDpoRender = Q(
    (s, dir) => {
      val resp = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(29)) =!= 0)
        .select(floor(col("doc_id") / 4).cast("long").as("prompt"),
          pmod(col("doc_id"), lit(4)).as("rid"), col("text"),
          length(col("text")).as("sc"))
      val pairs = graft.text.Pref.preferencePairs(
        resp, "prompt", "rid", "text", "sc", minMargin = 3.0)
      // unpivot the pair to (side, resp_id) FIRST, then rejoin texts in
      // ONE pass — two separate chosen/rejected joins would embed the
      // preferencePairs aggregate (and its documents scan) twice
      val sides = pairs.select(col("prompt_id"),
        explode(map(lit(0L), col("chosen_id"),
          lit(1L), col("rejected_id"))).as(Seq("side", "rid2")))
      val turns = sides.join(resp,
          sides("prompt_id") === resp("prompt") &&
            sides("rid2") === resp("rid"))
        .select((col("prompt_id") * 2 + col("side")).as("conv"),
          col("prompt_id"), col("side"), col("text"))
      val asTurns = turns.select(col("conv"), lit(0L).as("i"),
          lit("user").as("role"),
          concat(lit("q"), col("prompt_id").cast("string")).as("t"))
        .union(turns.select(col("conv"), lit(1L).as("i"),
          lit("assistant").as("role"), col("text").as("t")))
      graft.text.Chat.renderWithLossSpans(asTurns, "conv", "i", "role", "t")
        .select(floor(col("conv_id") / 2).cast("long").as("prompt_id"),
          when(pmod(col("conv_id"), lit(2)) === 0, lit("chosen"))
            .otherwise(lit("rejected")).as("side"),
          col("text"), col("s"), col("e"))
    },
    Some("WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id % 4 AS resp_id, text AS t, CAST(length(text) AS DOUBLE) AS sc FROM documents WHERE doc_id % 29 <> 0), " +
      "rk AS (SELECT *, row_number() OVER (PARTITION BY prompt_id ORDER BY sc DESC, resp_id DESC) AS ra, row_number() OVER (PARTITION BY prompt_id ORDER BY sc ASC, resp_id ASC) AS rb, count(*) OVER (PARTITION BY prompt_id) AS n FROM r), " +
      "ch AS (SELECT prompt_id, resp_id AS chosen_id, t AS ct, sc AS cs, n FROM rk WHERE ra = 1), " +
      "rj AS (SELECT prompt_id, resp_id AS rejected_id, t AS rt, sc AS rs FROM rk WHERE rb = 1), " +
      "pairs AS (SELECT ch.prompt_id, ct, rt FROM ch JOIN rj USING (prompt_id) WHERE n >= 2 AND cs - rs >= 3.0 AND ct <> rt), " +
      "sides AS (SELECT prompt_id, 'chosen' AS side, ct AS t FROM pairs UNION ALL SELECT prompt_id, 'rejected', rt FROM pairs), " +
      "rend AS (SELECT prompt_id, side, '<|user|>q' || CAST(prompt_id AS VARCHAR) || '<|end|><|assistant|>' || t || '<|end|>' AS text, " +
      "CAST(length('<|user|>q' || CAST(prompt_id AS VARCHAR) || '<|end|>') + 13 AS BIGINT) AS s, length(t) AS lt FROM sides) " +
      "SELECT prompt_id, side, text, s, s + lt AS e FROM rend"))

  /** Eval-side contamination fractions ([[graft.dedup.Dedup
    * .contaminationFraction]]): per held-out document, the fraction of
    * its distinct 5-grams found anywhere in the training slice — the
    * number benchmark contamination cards publish. Leaks are PLANTED:
    * even-id held docs swap in the text of doc_id+1 (always a train
    * member under the % 3 split), so the fixture has exact-1.0 rows,
    * organic partial overlap, and clean rows.
    */
  val dedupContaminationFrac = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val next = docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("next_text"))
      val held = docs.where(pmod(col("doc_id"), lit(3)) === 0)
        .join(next, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2)) === 0 &&
            col("next_text").isNotNull, col("next_text"))
            .otherwise(col("text")).as("text"))
      graft.dedup.Dedup.contaminationFraction(
          docs.where(pmod(col("doc_id"), lit(3)) =!= 0), held,
          "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_dirty"),
          col("frac"))
    },
    Some("WITH nx AS (SELECT doc_id - 1 AS doc_id, text AS next_text FROM documents), " +
      "held AS (SELECT d.doc_id, CASE WHEN d.doc_id % 2 = 0 AND nx.next_text IS NOT NULL THEN nx.next_text ELSE d.text END AS text FROM documents d LEFT JOIN nx USING (doc_id) WHERE d.doc_id % 3 = 0), " +
      "tw AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents WHERE doc_id % 3 <> 0), " +
      "tg AS (SELECT DISTINCT unnest(list_transform(generate_series(1, len(ws) - 4), i -> array_to_string(ws[i:i+4], ' '))) AS g FROM tw WHERE len(ws) >= 5), " +
      "hw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM held), " +
      "hg AS (SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(ws) - 4), i -> array_to_string(ws[i:i+4], ' ')))) AS g FROM hw WHERE len(ws) >= 5), " +
      "cnt AS (SELECT hg.doc_id, CAST(count(*) AS BIGINT) AS n_grams, CAST(sum(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty FROM hg LEFT JOIN tg ON hg.g = tg.g GROUP BY 1) " +
      "SELECT h.doc_id, COALESCE(n_grams, 0) AS n_grams, COALESCE(n_dirty, 0) AS n_dirty, CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0 ELSE floor(CAST(n_dirty AS DOUBLE) / n_grams * 10000.0 + 0.5) / 10000.0 END AS frac FROM held h LEFT JOIN cnt USING (doc_id)"))

  /** Corpus-trained bigram-LM document scoring ([[graft.text.NgramLm]])
    * — the perplexity-style quality gate (CCNet tier 1). Counts are
    * vocabulary-sized aggregates joined back onto the bigram stream;
    * the ln terms quantize to 9 decimals and the mean to 4 (the BM25
    * convention) so DuckDB re-derives the identical score.
    */
  val textPerplexity = Q(
    (s, dir) => graft.text.NgramLm.bigramLogProb(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text"),
    Some("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), bg AS (SELECT doc_id, ws[i + 1] AS w1, ws[i + 2] AS w2 FROM tk, unnest(range(len(ws) - 1)) AS u(i)), cb AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY 1, 2), cw AS (SELECT w1, count(*) AS c FROM bg GROUP BY 1), v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(ws) AS w FROM tk)), scored AS (SELECT bg.doc_id, round(ln((cb.c + 1) / (cw.c + v.v)), 9) AS lp FROM bg JOIN cb USING (w1, w2) JOIN cw USING (w1) CROSS JOIN v) SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, round(avg(lp), 4) AS avg_logprob FROM scored GROUP BY 1"))

  /** DSIR importance weights ([[graft.text.Dsir]], Xie et al. 2023):
    * hashed-bigram log-likelihood ratio of the target domain (here the
    * `lang = 'en'` slice) vs the raw corpus — the importance-resampling
    * data-selection recipe. The oracle re-derives the bucket hash
    * (md5 low 24 bits mod 4096), both smoothed marginals, and the
    * quantized log-ratio sum.
    */
  val textDsirWeights = Q(
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dsir.importanceWeights(docs, docs.where(col("lang") === "en"),
        "doc_id", "text")
    },
    Some("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), bg AS (SELECT doc_id, ws[i + 1] || ' ' || ws[i + 2] AS bg FROM tk, unnest(range(len(ws) - 1)) AS u(i)), bk AS (SELECT doc_id, CAST('0x' || substr(md5(bg), 1, 6) AS BIGINT) % 4096 AS bucket FROM bg), prof AS (SELECT doc_id, bucket, count(*) AS n FROM bk GROUP BY 1, 2), cr AS (SELECT bucket, sum(n) AS cr FROM prof GROUP BY 1), tb AS (SELECT bk.bucket FROM bk JOIN documents USING (doc_id) WHERE lang = 'en'), ct AS (SELECT bucket, count(*) AS ct FROM tb GROUP BY 1), tot AS (SELECT (SELECT sum(n) FROM prof) AS tr, (SELECT COALESCE(sum(ct), 0) FROM ct) AS tt), model AS (SELECT cr.bucket, round(ln((COALESCE(ct.ct, 0) + 1) / (tot.tt + 4096.0)) - ln((cr.cr + 1) / (tot.tr + 4096.0)), 9) AS lr FROM cr LEFT JOIN ct ON cr.bucket = ct.bucket CROSS JOIN tot) SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, round(sum(n * lr), 4) AS dsir_score FROM prof JOIN model USING (bucket) GROUP BY 1"))

  /** Unicode canonicalization ([[graft.functions.UnicodeNormalize]], a
    * native codegen Expression — Spark has no normalization built-in
    * and a UDF would drop out of codegen). The entry plants decomposed
    * graphemes (a + U+0301) identically in both engines, then checks
    * NFC recomposition (codepoint counts shrink back) and accent
    * stripping (recovers the original ASCII) against DuckDB's
    * nfc_normalize / strip_accents.
    */
  val textNormalize = Q(
    (s, dir) => {
      import graft.functions.UnicodeNormalize._
      val dec = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("d", regexp_replace(col("text"), "a", "á"))
      dec.select(col("doc_id"),
        length(col("d")).as("len_dec"),
        length(nfc(col("d"))).as("len_nfc"),
        stripAccents(col("d")).as("stripped"))
    },
    Some("WITH dec AS (SELECT doc_id, text, replace(text, 'a', 'a' || chr(769)) AS d FROM documents) SELECT doc_id, CAST(len(d) AS INT) AS len_dec, CAST(len(nfc_normalize(d)) AS INT) AS len_nfc, strip_accents(d) AS stripped FROM dec"))

  /** C4-style boilerplate-line removal
    * ([[TextAnalysis.stripBoilerplateLines]]): chrome lines planted on
    * doc_id residues in both engines; the census strips them while
    * per-doc unique lines survive, and documents reassemble in
    * original line order.
    */
  val textStripBoilerplate = Q(
    (s, dir) => {
      val aug = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .withColumn("s", concat(
          when(col("doc_id") % 2 === 0,
            lit("subscribe to our newsletter\n")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 3 === 0,
            lit("\nall rights reserved")).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit("\nref "), col("doc_id").cast("string")))
            .otherwise(lit(""))))
        .select(col("doc_id"), col("s"))
      TextAnalysis.stripBoilerplateLines(aug, "doc_id", "s", minDocs = 10)
    },
    Some("WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter' || chr(10) ELSE '' END || text || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'ref ' || CAST(doc_id AS VARCHAR) ELSE '' END AS s FROM documents), ls AS (SELECT doc_id, string_split(s, chr(10)) AS l FROM aug), lines AS (SELECT doc_id, i AS pos, l[i + 1] AS line FROM ls, unnest(range(len(l))) AS u(i)), census AS (SELECT line FROM (SELECT DISTINCT doc_id, line FROM lines) GROUP BY line HAVING count(*) >= 10), kept AS (SELECT doc_id, pos, line FROM lines WHERE line NOT IN (SELECT line FROM census)) SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean FROM kept GROUP BY doc_id"))

  /** Per-node triangle counts ([[graft.graph.Triangles.perNode]]) over
    * a synthesized 17-node link graph (edges from (doc_id) arithmetic,
    * deduped/canonicalized from their directed raw form) — the local
    * clustering signal for link-farm detection. The engine runs the
    * degree-ordered orientation (hub wedges re-centered at their
    * lower-degree neighbors); the oracle enumerates a<b<c triangles by
    * the canonical triple join — parity IS the orientation's
    * exactly-once claim. Zero-triangle nodes report 0.
    */
  val graphTriangles = Q(
    (s, dir) => graft.graph.Triangles.perNode(
      t(s, dir, "documents")
        .where(col("doc_id") % 41 < 6)
        .select(
          concat(lit("n"), (col("doc_id") % 17).cast("string")).as("a"),
          concat(lit("n"),
            (floor(col("doc_id") / 17).cast("long") % 17).cast("string"))
            .as("b")),
      "a", "b"),
    Some("WITH raw AS (SELECT 'n' || CAST(doc_id % 17 AS VARCHAR) AS a, 'n' || CAST((doc_id // 17) % 17 AS VARCHAR) AS b FROM documents WHERE doc_id % 41 < 6), " +
      "e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b), " +
      "tr AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v), " +
      "alln AS (SELECT u AS node FROM e UNION SELECT v AS node FROM e), " +
      "pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (SELECT a AS node FROM tr UNION ALL SELECT b AS node FROM tr UNION ALL SELECT c AS node FROM tr) GROUP BY 1) " +
      "SELECT node, COALESCE(pn.n_triangles, 0) AS n_triangles FROM alln LEFT JOIN pn USING (node)"))

  /** PageRank over a synthesized domain link graph
    * ([[graft.graph.PageRank]]): 5 damped iterations, each one
    * edge-keyed join + one destination-keyed sum, rank state quantized
    * to 9 decimals per iteration so the oracle's unrolled SQL
    * reproduces every iterate exactly. Edges derive deterministically
    * from (source, doc_id) in both engines.
    */
  val graphPagerank = Q(
    (s, dir) => {
      val edges = t(s, dir, "documents")
        .where(col("doc_id") % 29 < 3)
        .select(col("source").as("src"),
          concat(lit("src"), ((col("doc_id") * (length(col("source")) + 1))
            % 17).cast("string")).as("dst"))
        .distinct()
      graft.graph.PageRank.pagerank(edges, "src", "dst", iters = 5)
    },
    Some(("WITH e AS (SELECT DISTINCT source AS src, 'src' || CAST((doc_id * (1 + len(source))) % 17 AS VARCHAR) AS dst FROM documents WHERE doc_id % 29 < 3), " +
      "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)), " +
      "nn AS (SELECT count(*) AS n FROM nodes), " +
      "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1), " +
      "r0 AS (SELECT node, round(1.0 / n, 9) AS rank FROM nodes, nn), " +
      (1 to 5).map(k =>
        s"r$k AS (SELECT n2.node, round((1.0 - 0.85) / nn.n + 0.85 * COALESCE(s.mass, 0), 9) AS rank " +
          s"FROM nodes n2 CROSS JOIN nn LEFT JOIN (SELECT e.dst AS node, sum(r.rank / d.deg) AS mass " +
          s"FROM e JOIN r${k - 1} r ON r.node = e.src JOIN deg d ON d.node = e.src GROUP BY 1) s ON s.node = n2.node)")
        .mkString(", ") +
      " SELECT node, rank FROM r5")))

  /** Corpus data card — the one-page summary table every curation run
    * publishes (docs/tokens/langs/duplication/length spread) as ONE
    * entry in long (metric, value) format: counts and moments ride a
    * single aggregate over one scan (the Profile discipline), the
    * exact-dup fraction reuses the md5-fingerprint convention of
    * `dedup_exact`, and the token p50 uses the exact percentile the
    * a7 tier pins (approx_percentile at 100 TB, same shape). Quantizes
    * to 4 decimals.
    */
  val corpusDataCard = Q(
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("lang"), col("text"),
        TextAnalysis.tokenCount(col("text")).as("__nt"))
      val agg = d.agg(
        count(lit(1)).cast("double").as("n_docs"),
        sum(col("__nt")).cast("double").as("total_tokens"),
        round(avg(col("__nt")), 4).as("mean_tokens"),
        round(expr("percentile(__nt, 0.5)"), 4).as("p50_tokens"),
        countDistinct(col("lang")).cast("double").as("n_langs"),
        round(sum(when(col("lang") === "en", 1).otherwise(0)) /
          count(lit(1)).cast("double"), 4).as("en_frac"),
        round(lit(1.0) - countDistinct(md5(col("text"))) /
          count(lit(1)).cast("double"), 4).as("exact_dup_frac"))
      agg.select(explode(map(
        lit("n_docs"), col("n_docs"),
        lit("total_tokens"), col("total_tokens"),
        lit("mean_tokens"), col("mean_tokens"),
        lit("p50_tokens"), col("p50_tokens"),
        lit("n_langs"), col("n_langs"),
        lit("en_frac"), col("en_frac"),
        lit("exact_dup_frac"), col("exact_dup_frac")))
        .as(Seq("metric", "value")))
    },
    Some("WITH d AS (SELECT doc_id, lang, text, len(string_split_regex(lower(trim(text)), '\\s+')) AS nt FROM documents), " +
      "a AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, CAST(sum(nt) AS DOUBLE) AS total_tokens, round(avg(nt), 4) AS mean_tokens, round(quantile_cont(nt, 0.5), 4) AS p50_tokens, CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs, round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS en_frac, round(1.0 - count(DISTINCT md5(text)) / CAST(count(*) AS DOUBLE), 4) AS exact_dup_frac FROM d) " +
      "SELECT m.metric, CASE m.metric WHEN 'n_docs' THEN n_docs WHEN 'total_tokens' THEN total_tokens WHEN 'mean_tokens' THEN mean_tokens WHEN 'p50_tokens' THEN p50_tokens WHEN 'n_langs' THEN n_langs WHEN 'en_frac' THEN en_frac ELSE exact_dup_frac END AS value " +
      "FROM a CROSS JOIN (VALUES ('n_docs'), ('total_tokens'), ('mean_tokens'), ('p50_tokens'), ('n_langs'), ('en_frac'), ('exact_dup_frac')) m(metric)"))

  /** Label-propagation communities over the same link graph
    * ([[graft.graph.PageRank.labelPropagation]]) — the
    * community-detection complement of PageRank's centrality (link
    * farms and mirror clusters move TOGETHER even when individually
    * low-rank). Three fixed synchronous rounds, most-frequent neighbor
    * label with a min-label tie-break; the oracle unrolls every round
    * (count → deterministic argmax → carry), so each iterate is
    * pinned, not just the final partition.
    */
  val graphLpa = Q(
    (s, dir) => {
      val edges = t(s, dir, "documents")
        .where(col("doc_id") % 29 < 3)
        .select(col("source").as("src"),
          concat(lit("src"), ((col("doc_id") * (length(col("source")) + 1))
            % 17).cast("string")).as("dst"))
        .distinct()
      graft.graph.PageRank.labelPropagation(edges, "src", "dst", iters = 3)
    },
    Some(("WITH e AS (SELECT DISTINCT source AS src, 'src' || CAST((doc_id * (1 + len(source))) % 17 AS VARCHAR) AS dst FROM documents WHERE doc_id % 29 < 3), " +
      "e2 AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e), " +
      "nodes AS (SELECT DISTINCT src AS node FROM e2), " +
      "l0 AS (SELECT node, node AS lbl FROM nodes), " +
      (1 to 3).map(k =>
        s"c$k AS (SELECT e2.src AS node, l.lbl, count(*) AS cnt FROM e2 JOIN l${k - 1} l ON l.node = e2.dst GROUP BY 1, 2), " +
          s"p$k AS (SELECT node, lbl FROM (SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY cnt DESC, lbl) AS rn FROM c$k) WHERE rn = 1), " +
          s"l$k AS (SELECT l.node, COALESCE(p.lbl, l.lbl) AS lbl FROM l${k - 1} l LEFT JOIN p$k p ON p.node = l.node)")
        .mkString(", ") +
      " SELECT node, lbl AS community FROM l3")))

  /** HITS hubs-and-authorities over the same link graph
    * ([[graft.graph.PageRank.hits]], Kleinberg 1999): the directional
    * complement of PageRank — authorities rank content hosts, hubs
    * rank aggregators, and crawl seeding wants both. Three alternating
    * L2-normalized rounds, every sum/norm/quotient quantized to 9; the
    * oracle unrolls all three (in-sum → norm → out-sum → norm), so
    * each iterate is pinned.
    */
  val graphHits = Q(
    (s, dir) => {
      val edges = t(s, dir, "documents")
        .where(col("doc_id") % 29 < 3)
        .select(col("source").as("src"),
          concat(lit("src"), ((col("doc_id") * (length(col("source")) + 1))
            % 17).cast("string")).as("dst"))
        .distinct()
      graft.graph.PageRank.hits(edges, "src", "dst", iters = 3)
    },
    Some(("WITH e AS (SELECT DISTINCT source AS src, 'src' || CAST((doc_id * (1 + len(source))) % 17 AS VARCHAR) AS dst FROM documents WHERE doc_id % 29 < 3), " +
      "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)), " +
      "s0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS auth, CAST(1.0 AS DOUBLE) AS hub FROM nodes), " +
      (1 to 3).map(k =>
        s"ar$k AS (SELECT n.node, COALESCE(x.a, CAST(0.0 AS DOUBLE)) AS a FROM nodes n LEFT JOIN (SELECT e.dst AS node, round(sum(s.hub), 9) AS a FROM e JOIN s${k - 1} s ON s.node = e.src GROUP BY 1) x ON x.node = n.node), " +
          s"an$k AS (SELECT round(sqrt(round(sum(a * a), 9)), 9) AS nn FROM ar$k), " +
          s"a$k AS (SELECT node, round(a / nn, 9) AS auth FROM ar$k CROSS JOIN an$k), " +
          s"hr$k AS (SELECT n.node, COALESCE(x.h, CAST(0.0 AS DOUBLE)) AS h FROM nodes n LEFT JOIN (SELECT e.src AS node, round(sum(a2.auth), 9) AS h FROM e JOIN a$k a2 ON a2.node = e.dst GROUP BY 1) x ON x.node = n.node), " +
          s"hn$k AS (SELECT round(sqrt(round(sum(h * h), 9)), 9) AS nn FROM hr$k), " +
          s"s$k AS (SELECT a$k.node, a$k.auth, round(hr$k.h / hn$k.nn, 9) AS hub FROM a$k JOIN hr$k ON hr$k.node = a$k.node CROSS JOIN hn$k)")
        .mkString(", ") +
      " SELECT node, auth, hub FROM s3")))

  /** Root-to-node path linearization ([[graft.graph.TreePaths
    * .rootPaths]]): a heap-shaped parent-pointer tree over the
    * documents table (parent = (id−1)/2, id 0 the root) flattens to
    * (node, root, depth, '/'-joined path) through POINTER DOUBLING —
    * ⌈log₂ depth⌉ join rounds, one scalar action each, instead of a
    * depth-long walk. The oracle walks the same tree with a recursive
    * CTE, pinning every path string and depth.
    */
  val graphTreePaths = Q(
    (s, dir) => graft.graph.TreePaths.rootPaths(
      t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") === 0, lit(null).cast("long"))
          .otherwise(floor((col("doc_id") - 1) / 2).cast("long"))
          .as("parent")),
      "doc_id", "parent"),
    Some("WITH RECURSIVE walk AS (" +
      "SELECT doc_id AS node, doc_id AS cur, CAST(doc_id AS VARCHAR) AS path, 0 AS depth FROM documents " +
      "UNION ALL " +
      "SELECT node, (cur - 1) // 2 AS cur, CAST((cur - 1) // 2 AS VARCHAR) || '/' || path AS path, depth + 1 AS depth FROM walk WHERE cur <> 0) " +
      "SELECT node, CAST(cur AS BIGINT) AS root, CAST(depth AS BIGINT) AS depth, path FROM walk WHERE cur = 0"))

  /** Fill-in-the-middle transform ([[TextAnalysis.fimTransform]],
    * Bavarian et al. 2022): every document re-serialized in PSM order
    * with the half-open char span of the middle — the infilling
    * objective's data prep. The oracle re-derives the third cuts, the
    * sentinel assembly, and both span endpoints; an off-by-one lands
    * loss on sentinel text and fails the hash.
    */
  val textFim = Q(
    (s, dir) => TextAnalysis.fimTransform(
      t(s, dir, "documents"), "doc_id", "text"),
    Some("WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents), " +
      "c AS (SELECT doc_id, CAST(len(ws) AS INT) AS n, len(ws) // 3 AS p, (len(ws) * 2) // 3 AS m, ws FROM d), " +
      "parts AS (SELECT doc_id, n, array_to_string(ws[1:p], ' ') AS pre, array_to_string(ws[p+1:m], ' ') AS mid, array_to_string(ws[m+1:n], ' ') AS suf FROM c) " +
      "SELECT doc_id, n AS n_tokens, '<PRE>' || pre || '<SUF>' || suf || '<MID>' || mid AS text_fim, " +
      "CAST(length(pre) + length(suf) + 15 AS INT) AS mid_s, " +
      "CAST(length(pre) + length(suf) + 15 + length(mid) AS INT) AS mid_e FROM parts"))

  /** The END-TO-END LLM training-data prep as ONE executed pipeline:
    * quality-filter → exact-dedup (keep smallest id per fingerprint) →
    * per-source quota (two-phase salted rank, at most 20 docs per
    * source in deterministic hash order) → pack survivors into
    * 256-token sequences. Every stage has its own oracle entry
    * (text_quality, corpus_curation, so8, text_pack_sequences); this
    * one proves they COMPOSE — scoring rides one scan, the dedup
    * aggregate and quota rank are the only wide stages before the
    * pack windows, and nothing recomputes the corpus.
    */
  val corpusTrainingPrep = Q(
    (s, dir) => {
      val scored = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"),
          TextAnalysis.qualityScore(col("text")).as("quality"),
          TextAnalysis.fingerprint(col("text")).as("fp"))
        .where(col("quality") >= 0.5)
      val ded = scored.groupBy(col("fp"))
        .agg(min_by(struct(col("doc_id"), col("source"), col("text")),
          col("doc_id")).as("k"))
        .select(col("k.doc_id").as("doc_id"),
          col("k.source").as("source"), col("k.text").as("text"))
      val quota = Salted.topKPerGroup(ded, Seq("source"),
          Seq(md5(col("doc_id").cast("string")), col("doc_id")), k = 20)
        .select(col("doc_id"), col("text"))
      TextAnalysis.packSequences(quota, "doc_id", "text",
        maxTokens = 256, groups = 4)
    },
    Some("WITH b AS (SELECT doc_id, text, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS DOUBLE) AS n, CAST(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> list_contains(['the','a','of','and','to','in'], x))) AS DOUBLE) AS stophits, CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct FROM documents), q AS (SELECT doc_id, floor((least(1.0, n / 100.0) * 0.4 + least(1.0, stophits / n * 5.0) * 0.3 + (1.0 - punct / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality FROM b), kept0 AS (SELECT d.doc_id, d.source, d.text, md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp FROM q JOIN documents d USING (doc_id) WHERE q.quality >= 0.5), g AS (SELECT fp, min(doc_id) AS doc_id FROM kept0 GROUP BY fp), ded AS (SELECT k.doc_id, k.source, k.text FROM g JOIN kept0 k ON k.doc_id = g.doc_id), quota AS (SELECT doc_id, text FROM (SELECT doc_id, text, row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM ded) WHERE rk <= 20), tk AS (SELECT doc_id, doc_id % 4 AS grp, CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS toks FROM quota), c AS (SELECT grp, doc_id, toks, COALESCE(sum(toks) OVER (PARTITION BY grp ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM tk) SELECT grp, CAST(cum // 256 AS BIGINT) AS seq, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS n_tokens FROM c GROUP BY 1, 2"))

  /** Positional-postings phrase search
    * ([[TextAnalysis.phraseSearch]]): exact occurrence counts for a
    * 3-token phrase. The oracle deliberately uses a DIFFERENT
    * formulation (per-row sliding-window list arithmetic) than the
    * operator's postings joins — both must land on identical counts.
    */
  val textPhraseSearch = Q(
    (s, dir) => TextAnalysis.phraseSearch(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", "text", Seq("slow", "hash", "batch")),
    Some("WITH tk AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents), m AS (SELECT doc_id, CAST(len(list_filter(range(len(ws) - 2), i -> ws[i + 1] = 'slow' AND ws[i + 2] = 'hash' AND ws[i + 3] = 'batch')) AS BIGINT) AS n_matches FROM tk) SELECT doc_id, n_matches FROM m WHERE n_matches > 0"))

  /** Per-source characteristic terms by TF-IDF
    * ([[TextAnalysis.tfidfTopTerms]]): tf is one (source, term)
    * aggregate, df rides tf's distinct pairs, and the per-group top-5
    * uses the two-phase salted rank so coarse groups never serialize
    * the vocabulary through one window task.
    */
  val textTfidfTerms = Q(
    (s, dir) => TextAnalysis.tfidfTopTerms(
      t(s, dir, "documents").select(col("source"), col("text")),
      "source", "text", k = 5),
    Some("WITH tk AS (SELECT source, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents), tf AS (SELECT source, w, count(*) AS tf FROM tk GROUP BY 1, 2), dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY 1), g AS (SELECT count(DISTINCT source) AS g FROM tf), scored AS (SELECT source, w, tf, round(tf * round(ln(g.g / df), 9), 4) AS score FROM tf JOIN dfx USING (w) CROSS JOIN g) SELECT source, CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, w ASC) AS INT) AS rk, w, tf, score FROM scored QUALIFY rk <= 5"))

  /** Corpus bigram frequencies, top-20 with lexicographic tie-break —
    * the n-gram census behind contamination checks and boilerplate
    * detection. Explode + map-side-combining count + TakeOrdered: the
    * full bigram multiset never sorts globally, only the per-partition
    * top-20 candidates reach the driver.
    */
  val textNgrams = Q(
    (s, dir) => {
      val words = split(lower(trim(col("text"))), "\\s+")
      // zip of two shifted slices: O(len) per doc; a slice inside a
      // transform lambda would be O(len²) interpreted work per doc
      val bigrams = zip_with(
        slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => concat_ws(" ", a, b))
      t(s, dir, "documents")
        .select(explode(when(size(words) >= 2, bigrams)
          .otherwise(array().cast("array<string>"))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },
    // list comprehension: bigram positions track each doc's own length —
    // no fixed index-domain bound to fall out of sync with the data
    Some("WITH t AS (SELECT string_split_regex(lower(trim(text)), '\\s+') AS a FROM documents), g AS (SELECT unnest([a[i] || ' ' || a[i+1] FOR i IN generate_series(1, len(a) - 1)]) AS bigram FROM t) SELECT bigram, count(*) AS n FROM g GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20"))

  // --------------------------------------------------------------------
}
