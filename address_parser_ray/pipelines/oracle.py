"""DuckDB oracle SQL for every SQL-expressible query in
``pipelines.queries.QUERIES``. Tables ``region nation customer supplier
part orders lineitem events documents embeddings`` are pre-registered
views over the same parquet files.

Column aliases MUST match the Ray-side column names exactly (the driver
sorts columns by name before value-hashing). Money sums use
``CAST(floor(x*100) AS BIGINT)`` — bit-identical to numpy's floor on the
same IEEE doubles.

Queries absent here (minhash_lsh_clusters, media_features, er_quality,
...) are non-SQL-expressible (set-sketch / heuristic / actor-stateful
semantics); the driver records a rows-only check for those. Sketches
with deterministic arithmetic ARE expressible and checked — see the
splitmix64/rolling-hash macro twins (winnow_dup_pairs,
simhash_hamming_pairs) and the md5-fold sketches (distinct_kmv,
table_profile).
"""

# Shared macro prelude for the vectorized string-hash twins: strh60(s)
# reproduces functions.hashing.text_hash60 bit-for-bit (acc·B + byte
# polynomial over the characters, B = FNV-64 prime, + length, splitmix64
# finalize, top 60 bits).  ascii() = code point = UTF-8 byte under the
# ASCII-corpus assumption the shingle oracles already document.  Same
# xr/shr/mulmod64/smz*/sm64 definitions as the winnow/simhash twins
# (CREATE OR REPLACE keeps repeated installs on one connection safe).
_STRH_PRELUDE = r"""
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
CREATE OR REPLACE MACRO strh64(s) AS (
  sm64((CASE WHEN length(s) = 0 THEN CAST(0 AS HUGEINT)
        ELSE list_reduce(list_transform(range(1, length(s) + 1),
               i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS HUGEINT)),
               (a, b) -> (mulmod64(a, CAST(1099511628211 AS HUGEINT)) + b) % 18446744073709551616)
        END + length(s)) % 18446744073709551616)
);
CREATE OR REPLACE MACRO strh60(s) AS CAST(strh64(s) // 16 AS BIGINT);
"""

ORACLE_SQL = {
    "exact_dedup_groups": """
        SELECT sha256(COALESCE(text, '')) AS content_sha256,
               count(*)     AS n_dups,
               min(doc_id)  AS rep_doc_id
        FROM documents GROUP BY 1
    """,
    "lang_counts": """
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    """,
    "doc_stats_by_lang": """
        SELECT lang,
               count(*)     AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY lang
    """,
    "token_counts_by_lang": """
        SELECT lang,
               CAST(sum(len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))) AS BIGINT) AS sum_tokens
        FROM documents GROUP BY lang
    """,
    "quality_flags": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS n_tokens,
               length(COALESCE(text, ''))
                   - length(regexp_replace(COALESCE(text, ''), '[.,;:!?]', '', 'g'))
                   AS punct_chars
        FROM documents
    """,
    "top_docs": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
    "distinct_langs": """
        SELECT DISTINCT lang FROM documents ORDER BY lang
    """,
    "hash_split_counts": """
        SELECT CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END AS part,
               count(*) AS n
        FROM documents GROUP BY 1
    """,
    "filter_union_counts": """
        SELECT source, count(*) AS n FROM (
            SELECT source FROM documents WHERE lang = 'en' AND n_chars > 300
            UNION ALL
            SELECT source FROM documents WHERE lang = 'de'
        ) GROUP BY source
    """,
    "orders_by_nation": """
        SELECT n_name,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        SELECT c_custkey, c_name, total_cents, n_orders FROM (
            SELECT o_custkey,
                   CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
                   count(*) AS n_orders
            FROM orders GROUP BY o_custkey
        ) t JOIN customer ON t.o_custkey = c_custkey
        ORDER BY total_cents DESC, c_custkey LIMIT 10
    """,
    "events_hourly": """
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS hour,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        FROM events GROUP BY 1, 2
    """,
    "events_sliding_3h": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hour,
               CAST(sum(n) OVER (
                   PARTITION BY event_type ORDER BY hour
                   RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_3h
        FROM hourly
    """,
    # rank rule is pure-integer ((p*n+99)//100) on both sides — no float
    # quantile semantics involved
    "event_value_percentiles": """
        WITH h AS (
            SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ), c AS (
            SELECT event_type, cents,
                   sum(n) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
                   sum(n) OVER (PARTITION BY event_type) AS total
            FROM h
        )
        SELECT event_type,
               CAST(max(total) AS BIGINT) AS n,
               CAST(min(CASE WHEN cum >= (50 * total + 99) // 100 THEN cents END) AS BIGINT) AS p50_cents,
               CAST(min(CASE WHEN cum >= (90 * total + 99) // 100 THEN cents END) AS BIGINT) AS p90_cents,
               CAST(min(CASE WHEN cum >= (99 * total + 99) // 100 THEN cents END) AS BIGINT) AS p99_cents
        FROM c GROUP BY 1
    """,
    # the 60-bit hash is the strh60 polynomial twin of the engine's
    # vectorized text_hash60; estimator is HUGEINT-exact so the
    # comparison needs no float tolerance
    "distinct_kmv": """
        WITH h AS (
            SELECT DISTINCT lang,
                   strh60(COALESCE(text, '')) AS hv
            FROM documents
        ), r AS (
            SELECT lang, hv,
                   row_number() OVER (PARTITION BY lang ORDER BY hv) AS rk,
                   count(*) OVER (PARTITION BY lang) AS nd
            FROM h
        )
        SELECT lang,
               CAST(CASE WHEN max(nd) >= 64
                    THEN (CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
                         // max(CASE WHEN rk = 64 THEN hv END)
                    ELSE max(nd) END AS BIGINT) AS est_distinct
        FROM r GROUP BY 1
    """,
    # Markov transition counts; tie-break (ts, event_id) pinned on both sides
    "event_transitions": """
        WITH s AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM s WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    """,
    # Z-order vs linear layout audit: Morton interleave in explicit
    # integer arithmetic; scan cost = rows in partitions containing >=1 match
    "zorder_vs_linear": """
        WITH d AS (
            SELECT user_id % 256 AS x,
                   (epoch_us(ts) // 3600000000) % 256 AS y
            FROM events
        ), keyed AS (
            SELECT x, y,
                   ((x//1)%2)*1 + ((y//1)%2)*2 + ((x//2)%2)*4 + ((y//2)%2)*8
                 + ((x//4)%2)*16 + ((y//4)%2)*32 + ((x//8)%2)*64 + ((y//8)%2)*128
                 + ((x//16)%2)*256 + ((y//16)%2)*512 + ((x//32)%2)*1024
                 + ((y//32)%2)*2048 + ((x//64)%2)*4096 + ((y//64)%2)*8192
                 + ((x//128)%2)*16384 + ((y//128)%2)*32768 AS z,
                   x * 256 + y AS lin,
                   CASE WHEN x >= 64 AND x < 96 AND y >= 32 AND y < 64
                        THEN 1 ELSE 0 END AS m
            FROM d
        ), parts AS (
            SELECT 'zorder' AS layout, z // 1024 AS part,
                   count(*) AS n, CAST(sum(m) AS BIGINT) AS mm
            FROM keyed GROUP BY 1, 2
            UNION ALL
            SELECT 'linear', lin // 1024, count(*), CAST(sum(m) AS BIGINT)
            FROM keyed GROUP BY 1, 2
        )
        SELECT layout,
               CAST(sum(CASE WHEN mm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS partitions_touched,
               CAST(sum(CASE WHEN mm > 0 THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
               CAST(sum(mm) AS BIGINT) AS rows_matched
        FROM parts GROUP BY 1
    """,
    # weighted sample: integer A-ES priority = strh60-fold // weight
    "weighted_sample": """
        WITH p AS (
            SELECT lang, doc_id, n_chars,
                   CAST(strh60(COALESCE(text, ''))
                       // GREATEST(n_chars, 1) AS BIGINT) AS priority
            FROM documents
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY priority, doc_id) AS rk
            FROM p
        )
        SELECT lang, doc_id, n_chars, priority FROM r WHERE rk <= 5
    """,
    # data-quality expectation suite: one row per constraint
    "dq_expectations": """
        SELECT 'doc_id_not_null' AS expectation, count(*) AS n_checked,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM documents
        UNION ALL
        SELECT 'text_not_empty', count(*),
               CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_chars_in_range', count(*),
               CAST(sum(CASE WHEN n_chars < 1 OR n_chars > 100000 THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'lang_in_set', count(*),
               CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_chars_eq_len', count(*),
               CAST(sum(CASE WHEN length(COALESCE(text, '')) <> n_chars THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'doc_id_unique', count(*),
               CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
        FROM documents
    """,
    # snapshot diff: version B derived from base (11th deleted, 6th of
    # the survivors changed, 9th re-added under a new key); FULL OUTER
    # JOIN classification
    "snapshot_diff": """
        WITH a AS (
            SELECT doc_id, lang, n_chars AS fp FROM documents
        ), b AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 6 = 0 THEN n_chars + 50 ELSE n_chars END AS fp
            FROM documents WHERE doc_id % 11 <> 0
            UNION ALL
            SELECT doc_id + 10000000, lang, n_chars
            FROM documents WHERE doc_id % 9 = 0
        ), j AS (
            SELECT COALESCE(a.lang, b.lang) AS lang,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'deleted'
                        WHEN a.fp = b.fp THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM a FULL OUTER JOIN b USING (doc_id)
        )
        SELECT lang, status, count(*) AS n FROM j GROUP BY 1, 2
    """,
    # temporal dimension join: version valid at event time; signup =
    # per-user min ts; integer epoch-µs threshold (30 d = 2 592 000 000 000 µs)
    "scd2_temporal_join": """
        WITH su AS (
            SELECT user_id, min(ts) AS signup FROM events GROUP BY 1
        )
        SELECT CASE WHEN epoch_us(e.ts) >= epoch_us(su.signup) + 2592000000000
                    THEN 'tenured' ELSE 'new' END AS tier,
               e.event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM events e JOIN su USING (user_id)
        GROUP BY 1, 2
    """,
    # HyperLogLog registers: same strh60 hash as distinct_kmv; rank =
    # 55 - bit_length(h >> 6) via length(bin(w)) (w > 0); missing
    # registers contribute rank 0. All-integer estimator — HUGEINT twin
    # of the engine's Python-int arithmetic.
    "hll_distinct": """
        WITH h AS (
            SELECT lang,
                   strh60(COALESCE(text, '')) AS hv
            FROM documents
        ), r AS (
            SELECT lang, hv % 64 AS reg,
                   CASE WHEN hv // 64 = 0 THEN 55
                        ELSE 55 - length(bin(hv // 64)) END AS rnk
            FROM h
        ), m AS (
            SELECT lang, reg, max(rnk) AS mj FROM r GROUP BY 1, 2
        ), regs AS (
            SELECT l.lang, g.reg, COALESCE(m.mj, 0) AS mj
            FROM (SELECT DISTINCT lang FROM documents) l
            CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS reg) g
            LEFT JOIN m ON m.lang = l.lang AND m.reg = g.reg
        ), s AS (
            SELECT lang,
                   CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_regs,
                   sum(CAST(power(2, 55 - mj) AS HUGEINT)) AS denom
            FROM regs GROUP BY 1
        )
        SELECT lang, n_zero_regs,
               CAST(denom AS BIGINT) AS harmonic_denom,
               CAST((CAST(70937 AS HUGEINT) * 64 * 64 * CAST(power(2, 55) AS HUGEINT))
                    // (100000 * denom) AS BIGINT) AS est_raw
        FROM s
    """,
    "revenue_rollup": """
        WITH f AS (
            SELECT r.r_name, n.n_name,
                   CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
        )
        SELECT r_name, n_name,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM f GROUP BY 1, 2
        UNION ALL
        SELECT r_name, 'ALL', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
        FROM f GROUP BY 1
        UNION ALL
        SELECT 'ALL', 'ALL', CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
        FROM f
    """,
    # integer idf weight (L*1000)//df — exact on both sides, no float log
    "tfidf_top_terms": """
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_extract_all(
                       COALESCE(text, ''),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS token
            FROM documents
        ), counts AS (
            SELECT lang, token, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2
        ), l AS (
            SELECT count(DISTINCT lang) AS nl FROM documents
        ), scored AS (
            SELECT c.lang, c.token, c.tf,
                   c.tf * ((l.nl * 1000) // d.df) AS score
            FROM counts c
            JOIN (SELECT token, CAST(count(*) AS BIGINT) AS df
                  FROM counts GROUP BY 1) d ON d.token = c.token
            CROSS JOIN l
        ), ranked AS (
            SELECT lang, token, score,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY score DESC, token ASC
                   ) AS rk
            FROM scored
        )
        SELECT lang, CAST(rk AS BIGINT) AS rank, token,
               CAST(score AS BIGINT) AS score
        FROM ranked WHERE rk <= 5
    """,
    # same RE2-compatible pattern the engine compiles with re.ASCII
    "vocab_stats": """
        WITH tok AS (
            SELECT lang,
                   unnest(regexp_extract_all(
                       COALESCE(text, ''),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS token
            FROM documents
        ), counts AS (
            SELECT lang, token, CAST(count(*) AS BIGINT) AS n
            FROM tok GROUP BY 1, 2
        ), ranked AS (
            SELECT lang, token, n,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, token ASC
                   ) AS rk
            FROM counts
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(n) AS BIGINT) AS n_tokens,
               max(CASE WHEN rk = 1 THEN token END) AS top_token,
               CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT) AS top_token_n
        FROM ranked GROUP BY 1
    """,
    # integer splitmix rank (salt 1002 = queries._STRAT_SALT), doc_id
    # tie-break pinned on both engines
    "stratified_sample": """
        WITH k AS (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY sm64((CAST(doc_id AS HUGEINT) + 1002)
                                     % 18446744073709551616) // 16, doc_id
                   ) AS sample_rank
            FROM documents
        )
        SELECT lang, doc_id, CAST(sample_rank AS BIGINT) AS sample_rank
        FROM k WHERE sample_rank <= 3
    """,
    "customers_without_orders": """
        SELECT c.c_custkey, c.c_name,
               CAST(floor(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice >= 300000.0
        )
    """,
    "embedding_topk": """
        WITH q AS (
            SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
        )
        SELECT vec_id,
               floor(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            (SELECT qv FROM q)) * 1e6 + 1e-7) / 1e6
                   AS cos_sim
        FROM embeddings
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    "media_sizes": """
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    "largest_doc_per_lang": """
        SELECT lang, doc_id, n_chars FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    "top3_docs_per_source": """
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) WHERE rn <= 3
    """,
    "customers_per_region": """
        SELECT r_name, count(*) AS n_customers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "purchase_last_click": """
        SELECT p.event_id, p.user_id, max(c.ts) AS last_click_ts
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """,
    "purchase_clicks_1h": """
        SELECT p.event_id, p.user_id,
               CAST(count(c.event_id) AS BIGINT) AS n_clicks_1h
        FROM events p
        LEFT JOIN events c
          ON c.user_id = p.user_id
         AND c.event_type = 'click'
         AND c.ts > p.ts - INTERVAL 1 HOUR
         AND c.ts <= p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id, p.user_id
    """,
    "user_sessions": """
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(new_session) AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 1800 SECOND
                          OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ) GROUP BY user_id
    """,
    # quality_features parity: ratios are exact IEEE int/int divisions;
    # the blended score floors at 1e3 so libm-vs-numpy ln ulps can't flip
    # the comparison. Clip lower bounds are no-ops (ratios are >= 0).
    "quality_scores": """
        WITH f AS (
            SELECT doc_id,
                   length(COALESCE(text, '')) AS n_chars,
                   CASE WHEN trim(COALESCE(text, '')) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))
                   END AS n_tokens,
                   length(COALESCE(text, ''))
                       - length(regexp_replace(COALESCE(text, ''), '[.,;:!?]', '', 'g'))
                       AS punct,
                   length(COALESCE(text, ''))
                       - length(regexp_replace(COALESCE(text, ''), '[A-Za-z]', '', 'g'))
                       AS alpha,
                   len(list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'),
                       x -> list_contains(
                           ['the','and','of','to','a','in','is','that','for','it','with','was'],
                           lower(x))
                   )) AS stop_hits
            FROM documents
        ), r AS (
            SELECT doc_id, n_tokens,
                   CAST(stop_hits AS DOUBLE) / greatest(n_tokens, 1) AS stopword_ratio,
                   CAST(punct AS DOUBLE) / greatest(n_chars, 1) AS punct_ratio,
                   CAST(alpha AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio
            FROM f
        )
        SELECT doc_id, n_tokens, stopword_ratio,
               CAST(floor((0.4 * least(greatest(ln(1 + n_tokens) / ln(501.0), 0), 1)
                           + 0.3 * least(alpha_ratio / 0.7, 1)
                           + 0.2 * least(stopword_ratio / 0.3, 1)
                           + 0.1 * (1.0 - least(punct_ratio / 0.3, 1))) * 1000.0)
                    AS BIGINT) AS quality_score_1e3
        FROM r
    """,
    # knn output is int-only (ids + rank); float cosines stay internal on
    # both sides. Rank ties break on neighbor_vec_id; competing cosines
    # are spaced far wider than the ~1e-16 numpy-vs-duckdb ulp noise.
    "knn_bruteforce": """
        WITH q AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings ORDER BY vec_id LIMIT 5
        ), scored AS (
            SELECT q.qid AS query_vec_id,
                   e.vec_id AS neighbor_vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
            FROM embeddings e CROSS JOIN q
            WHERE e.vec_id != q.qid
        )
        SELECT query_vec_id, neighbor_vec_id, rank FROM (
            SELECT query_vec_id, neighbor_vec_id,
                   row_number() OVER (PARTITION BY query_vec_id
                                      ORDER BY cos DESC, neighbor_vec_id) AS rank
            FROM scored
        ) WHERE rank <= 3
    """,
    # IVF mirror: same 16-seed-centroid rule, nearest-centroid assignment
    # (cos desc, cid asc — matches numpy first-max argmax), nprobe=4 probe
    # lists, exact cosine ranked only within probed lists. Int-only output.
    # bit j compares two list_inner_product terms against the (2j,2j+1)
    # smallest-vec_id seed rows — the engine computes the same two
    # float64 dot products per bit
    "ann_lsh_buckets": """
        WITH s AS (
            SELECT CAST(embedding AS DOUBLE[]) AS v,
                   row_number() OVER (ORDER BY vec_id) - 1 AS rn
            FROM embeddings ORDER BY vec_id LIMIT 24
        ), planes AS (
            SELECT a.rn // 2 AS j, a.v AS av, b.v AS bv
            FROM s a JOIN s b ON b.rn = a.rn + 1
            WHERE a.rn % 2 = 0
        ), bits AS (
            SELECT e.vec_id,
                   sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.av)
                              > list_inner_product(CAST(e.embedding AS DOUBLE[]), p.bv)
                        THEN CAST(1 AS BIGINT) << CAST(p.j AS INT)
                        ELSE CAST(0 AS BIGINT) END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM bits GROUP BY 1
    """,
    "ann_ivf_topk": """
        WITH cent AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings ORDER BY vec_id LIMIT 16
        ), q AS (
            SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
            FROM embeddings ORDER BY vec_id LIMIT 5
        ), assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.cid
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ), probe AS (
            SELECT qid, cid FROM (
                SELECT q.qid, c.cid,
                       row_number() OVER (
                           PARTITION BY q.qid
                           ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid
                       ) AS rn
                FROM q CROSS JOIN cent c
            ) WHERE rn <= 4
        ), cand AS (
            SELECT p.qid AS query_vec_id, a.vec_id AS neighbor_vec_id,
                   list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cos
            FROM probe p
            JOIN assign a ON a.cid = p.cid
            JOIN embeddings e ON e.vec_id = a.vec_id
            JOIN q ON q.qid = p.qid
            WHERE a.vec_id != p.qid
        )
        SELECT query_vec_id, neighbor_vec_id, rank FROM (
            SELECT query_vec_id, neighbor_vec_id,
                   row_number() OVER (PARTITION BY query_vec_id
                                      ORDER BY cos DESC, neighbor_vec_id) AS rank
            FROM cand
        ) WHERE rank <= 3
    """,
    # BIO mirror: with the registered phrase list (all 2-token, chain-free
    # — no phrase's last token equals another's first, guarded by
    # test_bio_phrases_chain_free) the greedy left-to-right non-overlap
    # scan equals counting matching adjacent-token pairs; every match is
    # one B + one I. Tokens = lowercase \s+ split, empties dropped (ASCII
    # corpus — Python str.split() and '\\s+' agree there).
    "bio_label_counts": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(lower(COALESCE(text, '')), '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), hits AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN (tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]) IN
                        ('table scan', 'hash join', 'sort merge', 'group by')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM d)
            GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(h.n_b, 0) AS n_b,
               COALESCE(h.n_b, 0) AS n_i
        FROM d LEFT JOIN hits h USING (doc_id)
    """,
    # n_ngrams counts DISTINCT char-4-grams. The engine hashes UTF-8
    # BYTE 4-grams (64-bit, collision-free at doc scale); the oracle
    # counts character substrings — identical on ASCII corpora (the
    # testdata is ASCII; documented byte-semantics divergence otherwise).
    "ngram_jaccard_stats": """
        WITH d AS (
            SELECT doc_id, COALESCE(text, '') AS t FROM documents
        ), long AS (
            SELECT doc_id, count(DISTINCT substr(t, CAST(i AS INT), 4)) AS n_ngrams
            FROM (
                SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i
                FROM d WHERE length(t) >= 4
            )
            GROUP BY doc_id
        )
        SELECT doc_id, n_ngrams FROM long
        UNION ALL
        SELECT doc_id, CASE WHEN length(t) = 0 THEN 0 ELSE 1 END AS n_ngrams
        FROM d WHERE length(t) < 4
    """,
    # split sizes are exact: floor(0.9*n) / remainder (pinned Ray rule)
    "shuffle_split_write": """
        SELECT 'test' AS part,
               count(*) - CAST(floor(count(*) * 0.9) AS BIGINT) AS n
        FROM documents
        UNION ALL
        SELECT 'train' AS part, CAST(floor(count(*) * 0.9) AS BIGINT) AS n
        FROM documents
    """,
    # detect_lang parity: argmax of stopword hits over the first 4000
    # chars, strict-> loop over langs sorted asc == first CASE branch
    # hitting the max. The CJK branch never fires on the ASCII testdata
    # (documented assumption, same as ngram_jaccard_stats).
    "langid_pred": """
        WITH w AS (
            SELECT doc_id, lang,
                   list_transform(
                       regexp_extract_all(
                           substr(COALESCE(text, ''), 1, 4000), '[a-zA-Z]+'),
                       x -> lower(x)) AS words
            FROM documents
        ), h AS (
            SELECT doc_id, lang,
                   len(list_filter(words, x -> list_contains(
                       ['der','die','das','und','ist','nicht','ein','eine','mit','von','zu'], x))) AS h_de,
                   len(list_filter(words, x -> list_contains(
                       ['the','and','of','to','a','in','is','that','for','it','with','was'], x))) AS h_en,
                   len(list_filter(words, x -> list_contains(
                       ['el','la','los','las','es','una','del','que','por','para','como'], x))) AS h_es,
                   len(list_filter(words, x -> list_contains(
                       ['le','la','les','et','est','une','des','dans','que','pour','pas'], x))) AS h_fr
            FROM w
        )
        SELECT doc_id,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'unknown'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr'
               END AS pred_lang,
               lang
        FROM h
    """,
    "event_value_extremes": """
        SELECT event_type,
               min(CAST(floor(value * 100) AS BIGINT)) AS min_cents,
               max(CAST(floor(value * 100) AS BIGINT)) AS max_cents,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    # P5 inference-from-partial-evidence: lang masked on (doc_id//20)%10==3
    # (stride decorrelates the mask from source = f(doc_id%20)),
    # re-inferred as modal lang of the source group (ties -> lang asc).
    "infer_missing_lang": """
        WITH m AS (
            SELECT doc_id, source,
                   CASE WHEN (doc_id // 20) % 10 = 3 THEN NULL ELSE lang END AS lang_obs
            FROM documents
        ), ev AS (
            SELECT source, lang_obs AS lang, count(*) AS c
            FROM m WHERE lang_obs IS NOT NULL GROUP BY 1, 2
        ), best AS (
            SELECT source, lang,
                   row_number() OVER (
                       PARTITION BY source ORDER BY c DESC, lang ASC) AS rn
            FROM ev
        )
        SELECT m.doc_id,
               COALESCE(m.lang_obs, b.lang, 'und') AS lang_filled,
               (m.lang_obs IS NULL) AS inferred
        FROM m LEFT JOIN best b ON m.source = b.source AND b.rn = 1
    """,
    # HDR-style log histogram: bucket = bit_length(cents), pure-integer
    # on both sides (length of the binary string == bit length).
    "event_value_log_hist": """
        WITH x AS (
            SELECT event_type,
                   CAST(floor(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_type,
               CAST(CASE WHEN cents <= 0 THEN 0
                    ELSE length(bin(cents)) END AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM x GROUP BY 1, 2
    """,
    "dup_ratio_by_source": """
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT sha256(COALESCE(text, ''))) AS BIGINT)
                   AS n_distinct
        FROM documents GROUP BY source
    """,
    # Sequence packing: batch boundary = tokens_before // capacity,
    # a pure window prefix-sum partitioned by doc_id % 16 (the same
    # bucket fan-out the Ray side scans independently).
    "seq_pack_stats": """
        WITH t AS (
            SELECT doc_id, doc_id % 16 AS bucket,
                   len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'))
                       AS n_tokens
            FROM documents
        ), packed AS (
            SELECT bucket, n_tokens,
                   (CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens) // 512
                       AS batch_id
            FROM t
        )
        SELECT bucket, batch_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS batch_tokens
        FROM packed GROUP BY 1, 2
    """,
    # Decontamination: token 5-gram overlap vs the doc_id%97==0
    # benchmark slice; n_hits counts gram POSITIONS (each occurrence).
    "contamination_5gram": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS tl
            FROM documents
        ), grams AS (
            SELECT doc_id, array_to_string(list_slice(tl, i, i + 4), ' ') AS g
            FROM toks, unnest(range(1, greatest(len(tl) - 3, 1))) AS t(i)
        ), bench AS (
            SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
        ), hits AS (
            SELECT g.doc_id, count(b.g) AS n_hits
            FROM grams g LEFT JOIN bench b USING (g)
            GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               COALESCE(h.n_hits, 0) > 0 AS contaminated
        FROM documents d LEFT JOIN hits h USING (doc_id)
    """,
    # Gopher-style repetition: total vs distinct token 3-grams per doc.
    "repetition_stats": """
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS tl
            FROM documents
        ), grams AS (
            SELECT doc_id, array_to_string(list_slice(tl, i, i + 2), ' ') AS g
            FROM toks, unnest(range(1, greatest(len(tl) - 1, 1))) AS t(i)
        ), agg AS (
            SELECT doc_id, count(*) AS n_grams,
                   count(DISTINCT g) AS n_distinct
            FROM grams GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(a.n_distinct, 0) AS BIGINT) AS n_distinct
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "props_k_stats": """
        WITH x AS (
            SELECT event_type,
                   CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
            FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(k) AS BIGINT) AS sum_k,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k
        FROM x GROUP BY event_type
    """,
    "pivot_event_hours": """
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
               CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view,
               CAST(count(*) FILTER (WHERE event_type NOT IN
                    ('click','error','purchase','signup','view')) AS BIGINT) AS n_other
        FROM events GROUP BY 1
    """,
    # Integer milli-grid vector aggregation: floor(f64(e)*1000) is
    # bit-identical in numpy and DuckDB (f32->f64 widening is exact).
    "embedding_centroids": """
        SELECT label, gs AS dim,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CAST(floor(CAST(e AS DOUBLE) * 1000) AS BIGINT))
                    AS BIGINT) AS sum_milli
        FROM (
            SELECT label, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS gs
            FROM embeddings
        )
        GROUP BY label, gs
    """,
    # strh60 (source rate) and the sm64 row gate (salt 1003 =
    # queries._MIX_SALT) are both pure hashes of their keys, so the
    # "random" mixture is bit-identical in both engines.
    "mixture_sample": """
        WITH g AS (
            SELECT source, n_chars,
                   100 + strh60(source) % 800 AS rate_permille,
                   sm64((CAST(doc_id AS HUGEINT) + 1003)
                        % 18446744073709551616) // 16 % 1000 AS gate
            FROM documents
        )
        SELECT source,
               CAST(max(rate_permille) AS BIGINT) AS rate_permille,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN gate < rate_permille THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN gate < rate_permille THEN n_chars ELSE 0 END)
                    AS BIGINT) AS kept_chars
        FROM g GROUP BY 1
    """,
    # same pure-integer rank rule as event_value_percentiles; n_kept
    # rolls up from the same histogram the threshold came from
    "quality_quantile_filter": """
        WITH h AS (
            SELECT lang, n_chars, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2
        ), c AS (
            SELECT lang, n_chars, n,
                   sum(n) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
                   sum(n) OVER (PARTITION BY lang) AS total
            FROM h
        ), t AS (
            SELECT lang,
                   min(CASE WHEN cum >= (50 * total + 99) // 100
                            THEN n_chars END) AS thr,
                   max(total) AS total
            FROM c GROUP BY 1
        )
        SELECT h.lang,
               CAST(max(t.thr) AS BIGINT) AS p50_chars,
               CAST(max(t.total) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN h.n_chars >= t.thr THEN h.n ELSE 0 END)
                    AS BIGINT) AS n_kept
        FROM h JOIN t ON h.lang = t.lang GROUP BY 1
    """,
    # md5 of each chunk's joined tokens verifies chunk CONTENT, not just
    # the window arithmetic; list_slice is 1-indexed inclusive, matching
    # toks[i*24 : i*24+32]. Empty docs produce no chunks on either side.
    "doc_chunks": """
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS toks,
                   len(regexp_split_to_array(trim(COALESCE(text, '')), '\\s+')) AS n
            FROM documents
            WHERE length(trim(COALESCE(text, ''))) > 0
        ), c AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(
                       0,
                       CASE WHEN n <= 32 THEN 0
                            ELSE (n - 32 + 23) // 24 END)) AS chunk_idx
            FROM t
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(len(list_slice(toks, chunk_idx * 24 + 1,
                                   least(chunk_idx * 24 + 32, n))) AS BIGINT)
                   AS n_tokens,
               strh60(array_to_string(
                   list_slice(toks, chunk_idx * 24 + 1,
                              least(chunk_idx * 24 + 32, n)), ' ')) AS chunk_h60
        FROM c
    """,
    # same 16-seed-row hyperplane rule as ann_lsh_buckets, then exact
    # cosine within each bucket; the ≥0.30 gate and the output compare
    # the same floor(cos*1e4) basis points on both sides. The engine's
    # 2048-member bucket cap never binds at test scales.
    "embedding_near_dup": """
        WITH s AS (
            SELECT CAST(embedding AS DOUBLE[]) AS v,
                   row_number() OVER (ORDER BY vec_id) - 1 AS rn
            FROM embeddings ORDER BY vec_id LIMIT 16
        ), planes AS (
            SELECT a.rn // 2 AS j, a.v AS av, b.v AS bv
            FROM s a JOIN s b ON b.rn = a.rn + 1
            WHERE a.rn % 2 = 0
        ), bits AS (
            SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v,
                   sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), p.av)
                              > list_inner_product(CAST(e.embedding AS DOUBLE[]), p.bv)
                        THEN CAST(1 AS BIGINT) << CAST(p.j AS INT)
                        ELSE CAST(0 AS BIGINT) END) AS bucket
            FROM embeddings e CROSS JOIN planes p
            GROUP BY e.vec_id, v
        ), pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(floor(list_cosine_similarity(a.v, b.v) * 10000
                              + 0.0000001)
                        AS BIGINT) AS cos_bp
            FROM bits a JOIN bits b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, cos_bp FROM pairs WHERE cos_bp >= 3000
    """,
    # Exact-substring (Lee et al. ExactSubstr at token-8-gram
    # granularity): gram = 8 consecutive tokens (trim + ASCII-\s+ split,
    # lowered); duplicated = present in >= 2 distinct docs. Grouping by
    # the raw gram string equals the Ray side's 128-bit blake2b keys
    # (collision-free at any realistic scale). <8-token docs are zeros
    # via the LEFT JOIN.
    # Content-defined chunking: cut after 1-based position i (4 ≤ i ≤
    # n-1) when the 4-codepoint window hash (same four multipliers as
    # the Ray side, mod 2^32 then mod 61) hits 0; chunks are the spans
    # between cuts; a chunk instance is "duplicated" when its md5 occurs
    # in ≥ 2 distinct docs. ord() = codepoint = Python ord; length() /
    # substr() are codepoint-based = Python len / slicing; md5(string)
    # hashes the UTF-8 bytes = hashlib.md5(chunk.encode()). Empty/NULL
    # docs surface as zeros via the LEFT JOIN.
    "cdc_chunk_stats": """
        WITH d AS (
            SELECT doc_id, COALESCE(text, '') AS s,
                   length(COALESCE(text, '')) AS n
            FROM documents
        ), pos AS (
            SELECT doc_id, s,
                   unnest(generate_series(4, n - 1)) AS i
            FROM d WHERE n >= 5
        ), cut AS (
            SELECT doc_id, i + 1 AS st
            FROM pos
            WHERE (ord(substr(s, i - 3, 1)) * 2654435761
                 + ord(substr(s, i - 2, 1)) * 40503
                 + ord(substr(s, i - 1, 1)) * 2246822519
                 + ord(substr(s, i,     1)) * 3266489917)
                  % 4294967296 % 61 = 0
        ), starts AS (
            SELECT doc_id, 1 AS st FROM d WHERE n >= 1
            UNION ALL
            SELECT doc_id, st FROM cut
        ), sp AS (
            SELECT doc_id, st,
                   lead(st) OVER (PARTITION BY doc_id ORDER BY st) AS nxt
            FROM starts
        ), ch AS (
            SELECT sp.doc_id,
                   md5(substr(d.s, CAST(sp.st AS INT),
                              CAST(COALESCE(sp.nxt, d.n + 1) - sp.st AS INT)))
                       AS h,
                   COALESCE(sp.nxt, d.n + 1) - sp.st AS clen
            FROM sp JOIN d USING (doc_id)
        ), f AS (
            SELECT h, count(DISTINCT doc_id) AS nd FROM ch GROUP BY h
        ), per AS (
            SELECT c.doc_id,
                   CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_chunks,
                   CAST(sum(CASE WHEN f.nd >= 2 THEN c.clen ELSE 0 END)
                        AS BIGINT) AS dup_chars
            FROM ch c JOIN f USING (h) GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(per.n_chunks, 0) AS BIGINT) AS n_chunks,
               CAST(COALESCE(per.dup_chunks, 0) AS BIGINT) AS dup_chunks,
               CAST(COALESCE(per.dup_chars, 0) AS BIGINT) AS dup_chars
        FROM d LEFT JOIN per USING (doc_id)
    """,
    "dup_span_stats": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')),
                                             '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT doc_id,
                   lower(array_to_string(tk[i:i+7], ' ')) AS gram
            FROM (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8
            )
        ), df AS (
            SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1
        ), per AS (
            SELECT g.doc_id,
                   CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS dup_positions,
                   CAST(count(DISTINCT CASE WHEN nd >= 2 THEN g.gram END)
                        AS BIGINT) AS dup_grams
            FROM g JOIN df USING (gram) GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
               CAST(COALESCE(dup_positions, 0) AS BIGINT) AS dup_positions,
               CAST(COALESCE(dup_grams, 0) AS BIGINT) AS dup_grams
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY d.doc_id
    """,
    # Novelty attribution (dual of dup_span_stats): a doc's novel grams
    # are those whose min-doc_id owner it is. Distinct grams per doc.
    "gram_novelty": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')),
                                             '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                   lower(array_to_string(tk[i:i+7], ' ')) AS gram
            FROM (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8
            )
        ), own AS (
            SELECT gram, min(doc_id) AS owner FROM g GROUP BY 1
        ), per AS (
            SELECT g.doc_id,
                   CAST(count(*) AS BIGINT) AS n_distinct_grams,
                   CAST(sum(CASE WHEN g.doc_id = owner THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel_grams
            FROM g JOIN own USING (gram) GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_distinct_grams, 0) AS BIGINT)
                   AS n_distinct_grams,
               CAST(COALESCE(n_novel_grams, 0) AS BIGINT) AS n_novel_grams
        FROM documents d LEFT JOIN per USING (doc_id)
        ORDER BY d.doc_id
    """,
    # Cross-source contamination matrix: distinct 8-token grams present
    # in BOTH sources of a pair.
    "source_overlap": """
        WITH toks AS (
            SELECT source,
                   list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')),
                                             '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT DISTINCT source,
                   lower(array_to_string(tk[i:i+7], ' ')) AS gram
            FROM (
                SELECT source, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8
            )
        )
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # M16 analogue: first-token type classification; tokens are the
    # trim + ASCII-\s+ split with empties dropped (doc_chunks rule),
    # [1] on an empty list is NULL -> ''. Ties impossible (pure CASE).
    "type_prefix_counts": """
        WITH f AS (
            SELECT lang,
                   lower(COALESCE(
                       list_filter(
                           regexp_split_to_array(trim(COALESCE(text, '')),
                                                 '\\s+'),
                           x -> x <> '')[1], '')) AS tok1
            FROM documents
        )
        SELECT CASE
                 WHEN tok1 IN ('scan','merge','hash','sort','join')
                   THEN 'operator'
                 WHEN tok1 IN ('table','column','row','index') THEN 'schema'
                 WHEN tok1 IN ('customer','order','supplier','part')
                   THEN 'entity'
                 ELSE 'other'
               END AS kind,
               lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM f GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # G2 analogue: per-doc top-3 token frequencies, ties token-ascending
    # (row_number mirrors Python's sorted key (-n, token))
    "top_tokens_per_doc": """
        WITH toks AS (
            SELECT doc_id, lower(tok) AS token
            FROM (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(trim(COALESCE(text, '')),
                                                 '\\s+'),
                           x -> x <> '')) AS tok
                FROM documents
            )
        ), c AS (
            SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY 1, 2
        ), r AS (
            SELECT doc_id, token, n,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY n DESC, token ASC) AS rk
            FROM c
        )
        SELECT doc_id, CAST(rk AS BIGINT) AS rank, token, n
        FROM r WHERE rk <= 3
    """,
    # score_histogram's bin arithmetic pinned on an exact content score:
    # adjacent-doc-id pair fixture, distinct char-4-gram Jaccard, pure
    # integer bins ((20*inter)//union — no float boundary). <4-char docs
    # pad to one gram (same rule as ngram_jaccard_stats); pairs where
    # both sides have zero grams are dropped.
    "content_score_histogram": """
        WITH d AS (
            SELECT doc_id, COALESCE(text, '') AS t FROM documents
        ), g AS (
            SELECT doc_id, substr(t, CAST(i AS INT), 4) AS gram
            FROM (
                SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i
                FROM d WHERE length(t) >= 4
            )
            UNION
            SELECT doc_id, t || repeat(' ', 4 - length(t)) AS gram
            FROM d WHERE length(t) > 0 AND length(t) < 4
        ), n AS (
            SELECT doc_id, count(*) AS n FROM g GROUP BY 1
        ), p AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
        ), i AS (
            SELECT ga.doc_id AS id_a, count(*) AS inter
            FROM g ga JOIN g gb
              ON gb.gram = ga.gram AND gb.doc_id = ga.doc_id + 1
            GROUP BY 1
        ), s AS (
            SELECT p.id_a,
                   COALESCE(na.n, 0) + COALESCE(nb.n, 0)
                       - COALESCE(i.inter, 0) AS u,
                   COALESCE(i.inter, 0) AS inter
            FROM p LEFT JOIN n na ON na.doc_id = p.id_a
                   LEFT JOIN n nb ON nb.doc_id = p.id_b
                   LEFT JOIN i ON i.id_a = p.id_a
        )
        SELECT CAST((20 * inter) // u AS BIGINT) AS score_bin,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM s WHERE u > 0
        GROUP BY 1 ORDER BY 1
    """,
    # table profiler: one UNION ALL block per column; KMV distinct uses
    # the same md5-fold idiom as distinct_kmv over CAST(col AS VARCHAR)
    # (== Python str(int) for ints, identity for strings); min/max are
    # numeric-only with a -1 sentinel elsewhere (matches the engine)
    "table_profile": None,  # filled below by _build_table_profile_sql()
    # gap multiset depends only on each user's sorted ts sequence →
    # tie order is irrelevant and the lag window is exact
    "event_gap_histogram": """
        WITH g AS (
            SELECT user_id, ts,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
            FROM events
        ), d AS (
            SELECT date_diff('microsecond', prev, ts) AS gap
            FROM g WHERE prev IS NOT NULL
        )
        SELECT CAST(CASE WHEN gap <= 0 THEN 0
                    ELSE length(bin(gap)) END AS BIGINT) AS gap_bucket,
               CAST(count(*) AS BIGINT) AS n_gaps
        FROM d GROUP BY 1
    """,
    # one Lloyd iteration: IVF's assignment rule (cos desc, cid asc)
    # feeds the centroids' milli-grid sum rule. KNOWN PRECISION EDGE: a
    # near-TIE between two centroids' cosines (numpy argmax vs the SQL
    # row_number order) could assign a vector differently and fail the
    # hash on another corpus — if this row ever goes red, suspect a
    # last-ulp tie, not logic (the testdata has no such ties).
    "kmeans_update": """
        WITH cent AS (
            SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
            FROM embeddings ORDER BY vec_id LIMIT 16
        ), assign AS (
            SELECT vec_id, cid FROM (
                SELECT e.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(e.embedding AS DOUBLE[]), c.cv) DESC, c.cid
                       ) AS rn
                FROM embeddings e CROSS JOIN cent c
            ) WHERE rn = 1
        ), x AS (
            SELECT a.cid,
                   unnest(e.embedding) AS val,
                   generate_subscripts(e.embedding, 1) AS gs
            FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        )
        SELECT cid, CAST(gs AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n_vecs,
               CAST(sum(CAST(floor(CAST(val AS DOUBLE) * 1000) AS BIGINT))
                    AS BIGINT) AS sum_milli
        FROM x GROUP BY 1, 2
    """,
    # MERGE INTO semantics: delta (every 7th doc, version 1, +1000
    # chars, source 'delta') wins over base version 0
    "upsert_latest": """
        WITH u AS (
            SELECT doc_id, source, n_chars, CAST(0 AS BIGINT) AS version
            FROM documents
            UNION ALL
            SELECT doc_id, 'delta', n_chars + 1000, CAST(1 AS BIGINT)
            FROM documents WHERE doc_id % 7 = 0
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY version DESC) AS rn
            FROM u
        )
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, version
        FROM r WHERE rn = 1
    """,
    # the bloom is a prefilter only — the exact join removes its false
    # positives, so plain semi-join SQL is the oracle
    "bloom_semijoin_revenue": """
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders o
        WHERE o.o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal < 0
        )
        GROUP BY 1
    """,
    # exact df over distinct (token, doc) pairs; posting list = the 5
    # smallest doc_ids per token, comma-joined in numeric order (CAST to
    # VARCHAR matches Python str(int))
    "inverted_index": """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(
                       COALESCE(text, ''),
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS token
            FROM documents
        ), d AS (
            SELECT DISTINCT doc_id, token FROM tok
        ), r AS (
            SELECT token, doc_id,
                   row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn
            FROM d
        ), dfq AS (
            SELECT token, CAST(count(*) AS BIGINT) AS df FROM d GROUP BY 1
        ), tp AS (
            SELECT token,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                       AS top_docs
            FROM r WHERE rn <= 5 GROUP BY 1
        )
        SELECT dfq.token, dfq.df, tp.top_docs
        FROM dfq JOIN tp ON dfq.token = tp.token
    """,
    # strictly-later semantics on both sides: each stage's anchor is the
    # MIN ts of qualifying events after, and within 24 h of, the
    # previous stage's anchor
    "funnel_counts": """
        WITH v AS (
            SELECT user_id, min(ts) AS t0 FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ), c AS (
            SELECT e.user_id, min(e.ts) AS t1
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t0
              AND e.ts <= v.t0 + INTERVAL 24 HOUR
            GROUP BY e.user_id
        ), p AS (
            SELECT e.user_id
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t1
              AND e.ts <= c.t1 + INTERVAL 24 HOUR
            GROUP BY e.user_id
        )
        SELECT (SELECT count(*) FROM v) AS n_view,
               (SELECT count(*) FROM c) AS n_view_click,
               (SELECT count(*) FROM p) AS n_full_funnel
    """,
    # φ = 1/512 frequent items; the Ray side detects candidates with a
    # mergeable Misra–Gries sketch (zero false negatives by the n/(m+1)
    # deduction bound) and exact-verifies, so the output equals the
    # plain exact frequency filter below; gate is integer (512·c ≥ n).
    "heavy_hitters": """
        WITH toks AS (
            SELECT unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+'))
                   AS token
            FROM documents
        ), tt AS (
            SELECT token FROM toks WHERE token <> ''
        ), tot AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM tt
        )
        SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM tt, tot
        GROUP BY token, tot.n
        HAVING CAST(count(*) AS BIGINT) * 512 >= tot.n
        ORDER BY token
    """,
    # PII scrub: deterministic contact line appended on both sides (the
    # corpus has no natural PII); detect/redact emails then ≥9-digit
    # runs; md5 of the redacted text. DuckDB regexp_* and pyarrow's
    # regex kernels are both RE2, so pattern semantics match exactly.
    "pii_scrub": """
        WITH aug AS (
            SELECT doc_id,
                   COALESCE(text, '') || ' contact: ' || source || '.' ||
                   CAST(doc_id AS VARCHAR) || '@example.com id=' ||
                   CAST(1000000000 + doc_id AS VARCHAR) AS s
            FROM documents
        ), det AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(
                       s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'
                   )) AS BIGINT) AS n_emails,
                   regexp_replace(
                       s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'
                   ) AS s1
            FROM aug
        )
        SELECT doc_id, n_emails,
               CAST(len(regexp_extract_all(s1, '\\d{9,}')) AS BIGINT)
                   AS n_long_digits,
               strh60(regexp_replace(s1, '\\d{9,}', '<ID>', 'g')) AS clean_h60
        FROM det
    """,
    # Exact distributed quantiles (two-pass bracketing sketch). DuckDB's
    # quantile_disc picks the value at rank ceil(p*n) — the Ray side
    # resolves the same rank exactly, and both floor the same IEEE
    # double to cents.
    # Row-frame window scan: ROW_NUMBER + running SUM per user, ties on
    # ts broken by event_id on both sides. The window SUM is HUGEINT in
    # DuckDB — cast to BIGINT (the repo's oracle dtype rule).
    "user_running_totals": """
        WITH w AS (
            SELECT event_id, user_id, event_type,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS seq_no,
                   SUM(CAST(floor(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS run
            FROM events
        )
        SELECT event_id, user_id,
               CAST(seq_no AS BIGINT) AS seq_no,
               CAST(run AS BIGINT) AS running_cents
        FROM w WHERE event_type = 'purchase'
        ORDER BY event_id
    """,
    # Big-big join: orders x lineitem on orderkey, revenue per priority.
    # floor(price*(1-disc)*100) is the same left-assoc IEEE expression
    # numpy evaluates.
    # SCD2 intervals over the deterministic 3-version change stream
    # (v0 = base, v1 = every 5th doc, v2 = every 15th): valid_to = next
    # version of the same key via lead(), 9999 sentinel = open row.
    "scd2_history": """
        WITH h AS (
            SELECT doc_id, 0 AS version, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id, 1, 'v1', n_chars + 100 FROM documents
            WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id, 2, 'v2', n_chars + 200 FROM documents
            WHERE doc_id % 15 = 0
        )
        SELECT doc_id,
               CAST(version AS BIGINT) AS version,
               source,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(COALESCE(lead(version) OVER w, 9999) AS BIGINT)
                   AS valid_to,
               CAST(CASE WHEN lead(version) OVER w IS NULL
                         THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM h
        WINDOW w AS (PARTITION BY doc_id ORDER BY version)
    """,
    # ROLLUP hierarchy with '*' sentinels (GROUPING() distinguishes a
    # rolled-up axis from a hypothetical literal NULL, so the sentinel
    # is unambiguous).
    "rollup_counts": """
        SELECT CASE WHEN GROUPING(lang) = 1 THEN '*' ELSE lang END AS lang,
               CASE WHEN GROUPING(source) = 1 THEN '*' ELSE source END
                   AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents
        GROUP BY ROLLUP (lang, source)
    """,
    # Pareto frontier (maximize p_size, minimize price in integer
    # cents): classic NOT-EXISTS dominance; equal (size, price) rows do
    # not dominate each other, matching the engine's keep-mask.
    "pareto_parts": """
        WITH p AS (
            SELECT p_partkey,
                   CAST(p_size AS BIGINT) AS p_size,
                   CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents
            FROM part
        )
        SELECT x.p_partkey, x.p_size, x.price_cents
        FROM p x
        WHERE NOT EXISTS (
            SELECT 1 FROM p y
            WHERE y.p_size >= x.p_size AND y.price_cents <= x.price_cents
              AND (y.p_size > x.p_size OR y.price_cents < x.price_cents)
        )
    """,
    # 3 damped PageRank power iterations unrolled as CTEs over the
    # symmetrized customer↔supplier graph (nodes namespaced cust*2 /
    # supp*2+1 — src always even and dst always odd in e0, so the
    # UNION ALL symmetrization cannot create duplicates). Integer fixed
    # point: // floor-division matches numpy // on the all-positive
    # ranks; sums CAST to BIGINT (DuckDB sum() yields HUGEINT).
    "pagerank_ranks": """
        WITH e0 AS (
            SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ), e AS (
            SELECT src, dst FROM e0
            UNION ALL
            SELECT dst AS src, src AS dst FROM e0
        ), deg AS (
            SELECT src, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY src
        ), i1 AS (
            SELECT e.dst AS node,
                   150000000 + CAST(sum((CAST(1000000000 AS BIGINT) * 85)
                                        // (100 * deg.d))
                                    AS BIGINT) AS r
            FROM e JOIN deg USING (src)
            GROUP BY e.dst
        ), i2 AS (
            SELECT e.dst AS node,
                   150000000 + CAST(sum((i1.r * 85) // (100 * deg.d))
                                    AS BIGINT) AS r
            FROM e JOIN deg USING (src) JOIN i1 ON i1.node = e.src
            GROUP BY e.dst
        ), i3 AS (
            SELECT e.dst AS node,
                   150000000 + CAST(sum((i2.r * 85) // (100 * deg.d))
                                    AS BIGINT) AS r
            FROM e JOIN deg USING (src) JOIN i2 ON i2.node = e.src
            GROUP BY e.dst
        )
        SELECT node AS node_id, CAST(r AS BIGINT) AS rank_fp FROM i3
    """,
    "revenue_by_priority": """
        SELECT o.o_orderpriority,
               CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    # Bigram LM scoring: train counts and fixed-point conditional
    # probabilities in SQL, score every doc position. Integer floor
    # division (//) on both engines — no float drift possible.
    "bigram_lm_scores": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')),
                                             '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), tok AS (
            SELECT doc_id, lower(tk[i]) AS w1, lower(tk[i+1]) AS w2
            FROM (
                SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                FROM toks WHERE len(tk) >= 2
            )
        ), bg AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
            FROM tok GROUP BY 1, 2
        ), pref AS (
            SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_pref
            FROM bg GROUP BY 1
        ), scored AS (
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum((b.c_bg * 1000000) // p.c_pref) AS BIGINT)
                       AS lm
            FROM tok t
            JOIN bg b USING (w1, w2)
            JOIN pref p USING (w1)
            GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(lm, 0) AS BIGINT) AS lm_score
        FROM documents d LEFT JOIN scored USING (doc_id)
        ORDER BY d.doc_id
    """,
    # Connected components over the rare-gram co-occurrence graph: the
    # recursive CTE propagates every reachable label; min(label) per
    # node is the component's smallest doc_id — the same deterministic
    # "min wins" rule as the distributed union-find ladder.
    "gram_components": """
        WITH RECURSIVE toks AS (
            SELECT doc_id,
                   list_filter(
                       regexp_split_to_array(trim(COALESCE(text, '')),
                                             '\\s+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                   lower(array_to_string(tk[i:i+7], ' ')) AS gram
            FROM (
                SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                FROM toks WHERE len(tk) >= 8
            )
        ), rare AS (
            SELECT gram FROM g GROUP BY gram
            HAVING count(*) BETWEEN 2 AND 8
        ), gd AS (
            SELECT g.gram, g.doc_id FROM g JOIN rare USING (gram)
        ), edges AS (
            SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
            FROM gd a JOIN gd b
              ON a.gram = b.gram AND a.doc_id <> b.doc_id
        ), reach AS (
            SELECT doc_id AS id, doc_id AS lab FROM documents
            UNION
            SELECT e.dst AS id, r.lab
            FROM reach r JOIN edges e ON e.src = r.id
        ), comp AS (
            SELECT id AS doc_id, min(lab) AS component_id
            FROM reach GROUP BY 1
        )
        SELECT c.doc_id, c.component_id,
               CAST(count(*) OVER (PARTITION BY c.component_id)
                    AS BIGINT) AS component_size
        FROM comp c
        ORDER BY c.doc_id
    """,
    "quantile_sketch": """
        WITH q AS (
            SELECT quantile_disc(value,
                [0.01, 0.05, 0.25, 0.50, 0.75, 0.95, 0.99]) AS qs
            FROM events
        )
        SELECT CAST(unnest([1, 5, 25, 50, 75, 95, 99]) AS BIGINT) AS pct,
               CAST(floor(unnest(qs) * 100) AS BIGINT) AS value_cents
        FROM q
    """,
}


def _build_table_profile_sql() -> str:
    """One UNION ALL block per profiled column. Kept generated (the five
    blocks differ only in the column expression) so the KMV idiom stays
    in one place."""
    hash_expr = "CAST(strh60({expr}) AS HUGEINT)"
    blocks = []
    for col, numeric in (
        ("doc_id", True),
        ("lang", False),
        ("source", False),
        ("n_chars", True),
        ("text", False),
    ):
        expr = f"CAST({col} AS VARCHAR)" if numeric else col
        mn = f"CAST(COALESCE(min({col}), -1) AS BIGINT)" if numeric else "CAST(-1 AS BIGINT)"
        mx = f"CAST(COALESCE(max({col}), -1) AS BIGINT)" if numeric else "CAST(-1 AS BIGINT)"
        hv = hash_expr.format(expr=expr)
        blocks.append(f"""
        SELECT '{col}' AS "column",
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
               {mn} AS min_val,
               {mx} AS max_val,
               (WITH h AS (
                    SELECT DISTINCT {hv} AS hv
                    FROM documents WHERE {col} IS NOT NULL
                ), r AS (
                    SELECT hv,
                           row_number() OVER (ORDER BY hv) AS rk,
                           count(*) OVER () AS nd
                    FROM h
                )
                SELECT CAST(COALESCE(CASE WHEN max(nd) >= 64
                    THEN (CAST(63 AS HUGEINT) * CAST(1152921504606846976 AS HUGEINT))
                         // max(CASE WHEN rk = 64 THEN hv END)
                    ELSE max(nd) END, 0) AS BIGINT)
                FROM r) AS est_distinct
        FROM documents""")
    return "\nUNION ALL\n".join(blocks)


ORACLE_SQL["table_profile"] = _build_table_profile_sql()


def _build_winnow_sql() -> str:
    """Full-fidelity SQL twin of ``q_winnow_dup_pairs``: the normalizer
    (comment/docstring strip → whitespace fold → lower), the FNV-prime
    polynomial 8-gram rolling hash, splitmix64 (64-bit wraparound
    multiply emulated by 32-bit split products in HUGEINT — DuckDB
    raises on overflow instead of wrapping), the winnowing window-16 min
    (a ROWS window frame, valid starts only), the >64-doc boilerplate
    drop, and the ≥5-shared-fingerprint pair rule. ASCII-corpus
    assumption (``ascii()`` = UTF-8 byte), same as ngram_jaccard_stats.
    Built by string-replace only because a Python literal cannot hold
    triple-quote runs; the SQL itself is static. Macros are
    CREATE OR REPLACE so repeated runs on one connection are safe."""
    sql = r"""
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH norm AS (
  SELECT doc_id,
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(COALESCE(text, ''), '(?s)/\*.*?\*/', '', 'g'),
            $dq$(?s)@DQ@.*?@DQ@$dq$, '', 'g'),
          $sq$(?s)@SQ@.*?@SQ@$sq$, '', 'g'),
        '(#|//|--)[^\n]*', '', 'g'),
      '\s+', ' ', 'g'))) AS t0
  FROM documents
), padded AS (
  SELECT doc_id,
         CASE WHEN length(t0) < 8 THEN t0 || repeat(' ', 8 - length(t0))
              ELSE t0 END AS t
  FROM norm WHERE length(t0) > 0
), pos AS (
  SELECT doc_id, t, unnest(range(1, greatest(length(t) - 6, 2))) AS i
  FROM padded
), h AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
    sm64((
      ascii(substr(t, CAST(i AS INT), 1))     * CAST(14218562807570617051 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 1, 1)) * CAST(15895002104753931833 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 2, 1)) * CAST(913917546033277539 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 3, 1)) * CAST(11527715348014283921 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 4, 1)) * CAST(624165263380053675 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 5, 1)) * CAST(956575116354345 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 6, 1)) * CAST(1099511628211 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 7, 1))
    ) % 18446744073709551616) AS hv
  FROM pos
), nsh AS (
  SELECT doc_id, count(*) AS m FROM h GROUP BY 1
), wm AS (
  SELECT h.doc_id, h.i, nsh.m,
         min(hv) OVER (PARTITION BY h.doc_id ORDER BY h.i
                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS w
  FROM h JOIN nsh USING (doc_id)
), fps AS (
  SELECT DISTINCT doc_id, w AS fp
  FROM wm WHERE i <= greatest(m - 15, 1)
), grp AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 64
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
FROM fps a JOIN grp USING (fp) JOIN fps b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 5
"""
    return sql.replace("@DQ@", '"' * 3).replace("@SQ@", "'" * 3)


ORACLE_SQL["winnow_dup_pairs"] = _build_winnow_sql()


def _build_simhash_sql(tail: str | None = None) -> str:
    """Full-fidelity SQL twin of ``q_simhash_hamming_pairs``: the SAME
    normalizer as the fingerprint stage, the FNV-prime polynomial
    12-gram rolling hash + splitmix64 (macros shared with the winnow
    oracle), the unique-sorted min-2048 shingle sample, per-bit majority
    vote with ``simhash64``'s byte-view bit order (result bit ``b``
    reads source bit ``8*(7 - b//8) + b%8`` — the unpackbits/packbits/
    from_bytes('big') round trip is a byte swap of positions, verified
    against the numpy implementation), and the exhaustive Hamming ≤ 3
    self-join. The banded Ray plan emits exactly this set: Hamming ≤ 3
    over 64 bits guarantees ≥ 1 identical 16-bit band (pigeonhole), and
    the per-block pair caps need a >91-member identical-simhash run to
    bite. Empty-after-normalization docs get simhash 0 (LEFT JOIN).
    ASCII-corpus assumption, same as the winnow oracle."""
    # coefficients: 1099511628211^(11-i) mod 2^64 for the 12-gram poly
    coefs = [
        3510945102848213515, 1775861927039214153, 10622396531520239123,
        2232315406967589409, 14218562807570617051, 15895002104753931833,
        913917546033277539, 11527715348014283921, 624165263380053675,
        956575116354345, 1099511628211, 1,
    ]
    poly = " +\n      ".join(
        f"ascii(substr(t, CAST(i AS INT){f' + {j}' if j else ''}, 1)) "
        f"* CAST({c} AS HUGEINT)"
        for j, c in enumerate(coefs)
    )
    sql = r"""
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH norm AS (
  SELECT doc_id,
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(COALESCE(text, ''), '(?s)/\*.*?\*/', '', 'g'),
            $dq$(?s)@DQ@.*?@DQ@$dq$, '', 'g'),
          $sq$(?s)@SQ@.*?@SQ@$sq$, '', 'g'),
        '(#|//|--)[^\n]*', '', 'g'),
      '\s+', ' ', 'g'))) AS t0
  FROM documents
), padded AS (
  SELECT doc_id,
         CASE WHEN length(t0) < 12 THEN t0 || repeat(' ', 12 - length(t0))
              ELSE t0 END AS t
  FROM norm WHERE length(t0) > 0
), pos AS (
  SELECT doc_id, t, unnest(range(1, greatest(length(t) - 10, 2))) AS i
  FROM padded
), h AS (
  SELECT DISTINCT doc_id,
    sm64((
      @POLY@
    ) % 18446744073709551616) AS hv
  FROM pos
), rk AS (
  SELECT doc_id, hv,
         row_number() OVER (PARTITION BY doc_id ORDER BY hv) AS rk
  FROM h
), samp AS (
  SELECT doc_id, hv FROM rk WHERE rk <= 2048
), cnt AS (
  SELECT doc_id, count(*) AS m FROM samp GROUP BY 1
), bits AS (
  SELECT doc_id, b.b AS b,
         sum(CASE WHEN shr(hv, 8*(7 - b.b // 8) + (b.b % 8)) % 2 = 1
                  THEN 1 ELSE 0 END) AS c
  FROM samp CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
  GROUP BY 1, 2
), sim AS (
  SELECT bits.doc_id,
         sum(CASE WHEN 2 * c >= m THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS sh
  FROM bits JOIN cnt USING (doc_id) GROUP BY 1
), allsim AS (
  SELECT d.doc_id, CAST(COALESCE(sim.sh, 0) AS UBIGINT) AS sh
  FROM documents d LEFT JOIN sim ON d.doc_id = sim.doc_id
)
@TAIL@
"""
    default_tail = (
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b,\n"
        "       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming\n"
        "FROM allsim a JOIN allsim b ON a.doc_id < b.doc_id\n"
        "WHERE bit_count(xor(a.sh, b.sh)) <= 3"
    )
    return (
        sql.replace("@DQ@", '"' * 3)
        .replace("@SQ@", "'" * 3)
        .replace("@POLY@", poly)
        .replace("@TAIL@", tail or default_tail)
    )


ORACLE_SQL["simhash_hamming_pairs"] = _build_simhash_sql()


def _minhash_keys_sql(recursive: bool = False) -> str:
    """Full-fidelity SQL twin of ``q_minhash_band_keys``: the SAME
    normalizer + FNV-prime polynomial 8-gram rolling hash + splitmix64
    macros as the winnow oracle, then classic MinHash — per permutation
    p, sig_p = min((a_p·hv + b_p) mod 2⁶⁴) over the doc's shingle hashes
    (the (a, b) constants come from ``hashing.minhash_params(8, 7)``,
    deterministic, baked in as literals) — and the band fold
    ``lsh_band_keys``: folded = sm64(sm64(s_even)·POLY + s_odd),
    key = sm64(folded + band·2⁵⁶), emitted as 16-hex-digit text (u64
    does not fit BIGINT). Docs empty after normalization emit nothing
    (the Ray side's empty-shingle sentinel) on both sides."""
    from address_parser_ray.functions.hashing import minhash_params

    a, b = minhash_params(8, 7)
    M = 18446744073709551616
    sig_cols = ",\n    ".join(
        f"min((mulmod64(hv, CAST({int(a[p])} AS HUGEINT)) + {int(b[p])}) % {M}) AS s{p}"
        for p in range(8)
    )
    # one sm64 application per CTE stage — composing the three fold
    # steps in a single expression exceeds DuckDB's 128-deep macro
    # binder recursion (each sm64 expands to ~20 nested calls).
    e_cols = ", ".join(f"sm64(s{2 * bi}) AS e{bi}" for bi in range(4))
    f_cols = ",\n    ".join(
        f"sm64((mulmod64(e{bi}, 1099511628211) + s{2 * bi + 1}) % {M}) AS f{bi}"
        for bi in range(4)
    )
    k_cols = ",\n    ".join(
        f"sm64((f{bi} + {bi * (1 << 56)}) % {M}) AS k{bi}" for bi in range(4)
    )
    bands = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bi} AS band, k{bi} AS k FROM kx" for bi in range(4)
    )
    sql = r"""
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH norm AS (
  SELECT doc_id,
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(COALESCE(text, ''), '(?s)/\*.*?\*/', '', 'g'),
            $dq$(?s)@DQ@.*?@DQ@$dq$, '', 'g'),
          $sq$(?s)@SQ@.*?@SQ@$sq$, '', 'g'),
        '(#|//|--)[^\n]*', '', 'g'),
      '\s+', ' ', 'g'))) AS t0
  FROM documents
), padded AS (
  SELECT doc_id,
         CASE WHEN length(t0) < 8 THEN t0 || repeat(' ', 8 - length(t0))
              ELSE t0 END AS t
  FROM norm WHERE length(t0) > 0
), pos AS (
  SELECT doc_id, t, unnest(range(1, greatest(length(t) - 6, 2))) AS i
  FROM padded
), h AS (
  SELECT doc_id,
    sm64((
      ascii(substr(t, CAST(i AS INT), 1))     * CAST(14218562807570617051 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 1, 1)) * CAST(15895002104753931833 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 2, 1)) * CAST(913917546033277539 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 3, 1)) * CAST(11527715348014283921 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 4, 1)) * CAST(624165263380053675 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 5, 1)) * CAST(956575116354345 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 6, 1)) * CAST(1099511628211 AS HUGEINT) +
      ascii(substr(t, CAST(i AS INT) + 7, 1))
    ) % 18446744073709551616) AS hv
  FROM pos
), sig AS (
  SELECT doc_id,
    @SIGS@
  FROM h GROUP BY 1
), e AS MATERIALIZED (
  SELECT doc_id, @ECOLS@, s1, s3, s5, s7 FROM sig
), f AS MATERIALIZED (
  SELECT doc_id,
    @FCOLS@
  FROM e
), kx AS MATERIALIZED (
  SELECT doc_id,
    @KCOLS@
  FROM f
), keys AS (
@BANDS@
)
"""
    out = (
        sql.replace("@DQ@", '"' * 3)
        .replace("@SQ@", "'" * 3)
        .replace("@SIGS@", sig_cols)
        .replace("@ECOLS@", e_cols)
        .replace("@FCOLS@", f_cols)
        .replace("@KCOLS@", k_cols)
        .replace("@BANDS@", bands)
    )
    if recursive:
        out = out.replace("WITH norm AS (", "WITH RECURSIVE norm AS (", 1)
    return out


ORACLE_SQL["minhash_band_keys"] = _minhash_keys_sql() + """
SELECT doc_id, CAST(band AS BIGINT) AS band,
       lower(lpad(hex(CAST(k AS UBIGINT)), 16, '0')) AS band_key
FROM keys ORDER BY doc_id, band
"""

# The same band keys closed into components: edges join docs sharing a
# (band, key); min-label transitive closure via the recursive-CTE
# pattern of gram_components. Every doc (incl. empty-normalized ones,
# which emit no keys) seeds its own label.
_MH_CLUSTER_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
)
SELECT doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
           AS cluster_size
FROM comp ORDER BY doc_id
"""

# note: _minhash_keys_sql ends with "keys AS (...)\n)\n" — the tail
# above must continue the SAME with-chain, so strip the trailing
# newline between them and join with a comma (the tail starts ", edges").
ORACLE_SQL["minhash_cluster_ids"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _MH_CLUSTER_TAIL
)

# clustering agreement: exact-dup labels vs the LSH clustering above.
# ARI numerator is provably nonnegative here (identical texts share
# identical sketches, so every exact-dup pair is also an LSH pair ⇒
# nab = na), keeping // floor-vs-trunc semantics out of play.
_MH_AGREE_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), alab AS (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(COALESCE(text, ''))) AS label_a
    FROM documents
), cells AS (
    SELECT alab.label_a, comp.cluster_id AS label_b,
           CAST(count(*) AS HUGEINT) AS n
    FROM alab JOIN comp USING (doc_id) GROUP BY 1, 2
), terms AS (
    SELECT (SELECT sum(n * (n - 1) // 2) FROM cells) AS nab,
           (SELECT sum(m * (m - 1) // 2) FROM
               (SELECT sum(n) AS m FROM cells GROUP BY label_a)) AS na,
           (SELECT sum(m * (m - 1) // 2) FROM
               (SELECT sum(n) AS m FROM cells GROUP BY label_b)) AS nb,
           (SELECT sum(n) FROM cells) AS nd
)
SELECT CAST(nd AS BIGINT) AS n_docs,
       CAST(nab AS BIGINT) AS pairs_both,
       CAST(na AS BIGINT) AS pairs_a,
       CAST(nb AS BIGINT) AS pairs_b,
       CAST(CASE WHEN nd * (nd - 1) // 2 * (na + nb) - 2 * na * nb = 0 THEN 1000
            ELSE (1000 * 2 * (nd * (nd - 1) // 2 * nab - na * nb))
                 // (nd * (nd - 1) // 2 * (na + nb) - 2 * na * nb)
            END AS BIGINT) AS ari_milli
FROM terms
"""

ORACLE_SQL["clustering_agreement"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _MH_AGREE_TAIL
)

ORACLE_SQL["name_edit_pairs"] = """
    WITH d AS (SELECT p_name, count(*) AS n FROM part GROUP BY 1)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n * b.n AS BIGINT) AS n_row_pairs
    FROM d a JOIN d b ON a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY 1, 2
"""

# token-equality membership (no \b ambiguity); RE2 \s is ASCII-only,
# matching the Ray side's re.ASCII split.
ORACLE_SQL["keyword_tags"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS tok
        FROM documents
    )
    SELECT tok AS keyword,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_hits
    FROM toks
    WHERE tok IN ('hash', 'join', 'merge', 'scan', 'sort', 'table')
    GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["value_moments"] = """
    WITH c AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM c GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["cdc_with_deletes"] = """
    WITH delta_u AS (
        SELECT doc_id, 'delta' AS source, n_chars + 1000 AS n_chars,
               1 AS version, 'U' AS op
        FROM documents WHERE doc_id % 7 = 0
    ), delta_d AS (
        SELECT doc_id, '' AS source, 0 AS n_chars, 2 AS version, 'D' AS op
        FROM documents WHERE doc_id % 11 = 0
    ), unioned AS (
        SELECT doc_id, source, n_chars, 0 AS version, 'U' AS op
        FROM documents
        UNION ALL SELECT * FROM delta_u
        UNION ALL SELECT * FROM delta_d
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY version DESC
        ) AS rk
        FROM unioned
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(version AS BIGINT) AS version
    FROM ranked WHERE rk = 1 AND op != 'D'
    ORDER BY doc_id
"""

ORACLE_SQL["embedding_dim_stats"] = """
    WITH v AS (
        SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ), m AS (
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS milli
        FROM v
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(milli) AS BIGINT) AS sum_milli,
           CAST(min(milli) AS BIGINT) AS min_milli,
           CAST(max(milli) AS BIGINT) AS max_milli
    FROM m GROUP BY 1 ORDER BY 1
"""

# DuckDB's jaro_winkler_similarity (rapidfuzz) applies the prefix boost
# only above jaro 0.7 — the Ray side mirrors that; both floor to
# micro-units with the +1e-7 epsilon guard.
ORACLE_SQL["jw_name_pairs"] = """
    WITH d AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 1000000
                      + 0.0000001) AS BIGINT) AS jw_micro
    FROM d a JOIN d b ON a.p_name < b.p_name
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
    ORDER BY 1, 2
"""

ORACLE_SQL["token_cooccurrence"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS tok
        FROM documents
    ), tc AS (
        SELECT tok, count(*) AS n FROM toks WHERE tok != '' GROUP BY 1
    ), top AS (
        SELECT tok FROM tc ORDER BY n DESC, tok LIMIT 32
    ), dt AS (
        SELECT DISTINCT doc_id, tok FROM toks WHERE tok IN (SELECT tok FROM top)
    )
    SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(count(*) AS BIGINT) AS n_docs_both
    FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["user_spend_ranks"] = """
    WITH s AS (
        SELECT user_id,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS spend_cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT user_id, spend_cents,
           CAST(row_number() OVER (ORDER BY spend_cents, user_id) AS BIGINT)
               AS spend_rank
    FROM s ORDER BY user_id
"""

ORACLE_SQL["retention_cohorts"] = """
    WITH d AS (
        SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
        FROM events
    ), first AS (
        SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1
    ), act AS (
        SELECT DISTINCT d.user_id, first.cohort_day, d.day AS active_day
        FROM d JOIN first USING (user_id)
    )
    SELECT cohort_day, active_day, CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLE_SQL["fk_orphans"] = """
    SELECT 'customer.c_nationkey->nation' AS relation,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY 1
"""

ORACLE_SQL["sorted_neighborhood"] = """
    WITH r AS (
        SELECT c_custkey,
               row_number() OVER (
                   ORDER BY CAST(floor(c_acctbal * 100) AS BIGINT), c_custkey
               ) - 1 AS rank0
        FROM customer
    )
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(b.rank0 - a.rank0 AS BIGINT) AS dist
    FROM r a JOIN r b ON b.rank0 > a.rank0 AND b.rank0 <= a.rank0 + 2
    ORDER BY 1, 2
"""

ORACLE_SQL["meta_blocking"] = """
    WITH arrs AS (
        SELECT doc_id,
               regexp_split_to_array(COALESCE(text, ''), '\\s+') AS arr
        FROM documents
    ), raw AS (
        SELECT doc_id, arr[i] || ' ' || arr[i + 1] AS tok
        FROM arrs, unnest(range(1, len(arr))) AS t(i)
        WHERE arr[i] != '' AND arr[i + 1] != ''
    ), toks AS (
        SELECT DISTINCT doc_id, tok FROM raw
    ), q AS (
        SELECT tok FROM toks GROUP BY tok HAVING count(*) BETWEEN 2 AND 64
    ), p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS cbs
        FROM toks a
        JOIN q ON q.tok = a.tok
        JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, CAST(cbs AS BIGINT) AS cbs
    FROM p WHERE cbs >= 2 ORDER BY 1, 2
"""


def _fs_em_sql(iters: int, classify: bool = False) -> str:
    """SQL twin of the quantized Fellegi-Sunter EM loop: the combo
    histogram (8 integers, a sufficient statistic for every iteration)
    pivots into ONE row; the recursion carries (p, m1..m3, u1..u3) as
    scalar DOUBLE columns through the SAME left-associated multiply
    chains and 1/2^20 fixed-point E-step quantization as the Ray side
    (``queries._fs_em_step``) — no aggregates inside the recursion, so
    every iteration is bit-deterministic."""
    Q = 1 << 20
    counts = ",\n      ".join(
        "CAST(sum(CASE WHEN g1 = {b1} AND g2 = {b2} AND g3 = {b3} "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n{c}".format(
            b1=(c >> 2) & 1, b2=(c >> 1) & 1, b3=c & 1, c=c
        )
        for c in range(8)
    )

    def wexpr(c: int) -> str:
        t = [
            (f"m{k + 1}" if (c >> (2 - k)) & 1 else f"(1.0 - m{k + 1})")
            for k in range(3)
        ]
        v = [
            (f"u{k + 1}" if (c >> (2 - k)) & 1 else f"(1.0 - u{k + 1})")
            for k in range(3)
        ]
        a = f"(((p * {t[0]}) * {t[1]}) * {t[2]})"
        b = f"((((1.0 - p) * {v[0]}) * {v[1]}) * {v[2]})"
        return (
            f"CAST(floor(({a} / ({a} + {b})) * {Q} + 0.5 + 0.000000001) "
            f"AS BIGINT) AS w{c}"
        )

    wcols = ",\n           ".join(wexpr(c) for c in range(8))
    s_expr = " + ".join(f"n{c} * w{c}" for c in range(8))
    t_expr = " + ".join(f"n{c} * ({Q} - w{c})" for c in range(8))
    n_expr = " + ".join(f"n{c}" for c in range(8))

    def sk(k: int) -> str:  # combos where field k agrees (bit 2-k set)
        return " + ".join(
            f"n{c} * w{c}" for c in range(8) if (c >> (2 - k)) & 1
        )

    def tk(k: int) -> str:
        return " + ".join(
            f"n{c} * ({Q} - w{c})" for c in range(8) if (c >> (2 - k)) & 1
        )

    # parameter clamp to [2^-20, 1 - 2^-20] (exact binary doubles,
    # mirroring queries._FS_EPS): perfectly-separated data otherwise
    # drives m/u to exactly 1/0 and zeroes both mixture likelihoods
    EPS = "0.00000095367431640625"
    HI = "0.99999904632568359375"

    def cl(num: str, den: str) -> str:
        x = f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"
        return (
            f"least(greatest(CASE WHEN {den} > 0 THEN {x} "
            f"ELSE {EPS} END, {EPS}), {HI})"
        )

    if classify:
        # per-pair posterior from the CONVERGED params: the same
        # left-associated chain, with g-bits per pair instead of per combo
        tc = [
            f"(CASE WHEN g{k + 1} = 1 THEN m{k + 1} "
            f"ELSE (1.0 - m{k + 1}) END)"
            for k in range(3)
        ]
        vc = [
            f"(CASE WHEN g{k + 1} = 1 THEN u{k + 1} "
            f"ELSE (1.0 - u{k + 1}) END)"
            for k in range(3)
        ]
        ac = f"(((p * {tc[0]}) * {tc[1]}) * {tc[2]})"
        bc = f"((((1.0 - p) * {vc[0]}) * {vc[1]}) * {vc[2]})"
        final = f"""
SELECT pr.pair_id,
       CAST(pr.g1 * 4 + pr.g2 * 2 + pr.g3 AS BIGINT) AS combo,
       CAST(floor(({ac} / ({ac} + {bc})) * {Q} + 0.5 + 0.000000001)
            AS BIGINT) AS w_fix,
       CAST(CASE WHEN floor(({ac} / ({ac} + {bc})) * {Q} + 0.5
                             + 0.000000001) >= {Q // 2}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_match
FROM pr, (SELECT * FROM st WHERE it = {iters}) fin
ORDER BY pr.pair_id
"""
    else:
        final = f"""
SELECT x.field,
       CAST(floor(1000000 * x.m + 0.0000001) AS BIGINT) AS m_micro,
       CAST(floor(1000000 * x.u + 0.0000001) AS BIGINT) AS u_micro,
       CAST(floor(1000000 * x.p + 0.0000001) AS BIGINT) AS p_micro
FROM (
    SELECT 'mktsegment' AS field, m1 AS m, u1 AS u, p FROM st WHERE it = {iters}
    UNION ALL
    SELECT 'nationkey', m2, u2, p FROM st WHERE it = {iters}
    UNION ALL
    SELECT 'acctbal', m3, u3, p FROM st WHERE it = {iters}
) x
ORDER BY x.field
"""
    return f"""
WITH RECURSIVE pr AS (
    SELECT a.c_custkey // 2 AS pair_id,
           CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS g1,
           CASE WHEN a.c_nationkey = b.c_nationkey THEN 1 ELSE 0 END AS g2,
           CASE WHEN abs(CAST(floor(a.c_acctbal * 100) AS BIGINT)
                         - CAST(floor(b.c_acctbal * 100) AS BIGINT)) < 50000
                THEN 1 ELSE 0 END AS g3
    FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    WHERE a.c_custkey % 2 = 0
), cc AS (
    SELECT
      {counts}
    FROM pr
), st AS (
    SELECT 0 AS it,
           CAST(0.125 AS DOUBLE) AS p,
           CAST(0.9375 AS DOUBLE) AS m1,
           CAST(0.9375 AS DOUBLE) AS m2,
           CAST(0.9375 AS DOUBLE) AS m3,
           CAST(0.25 AS DOUBLE) AS u1,
           CAST(0.0625 AS DOUBLE) AS u2,
           CAST(0.5 AS DOUBLE) AS u3
    UNION ALL
    SELECT it + 1,
           {cl('S', f'N * {Q}')} AS p,
           {cl('S1', 'S')} AS m1,
           {cl('S2', 'S')} AS m2,
           {cl('S3', 'S')} AS m3,
           {cl('T1', 'T')} AS u1,
           {cl('T2', 'T')} AS u2,
           {cl('T3', 'T')} AS u3
    FROM (
        SELECT it,
               {n_expr} AS N,
               {s_expr} AS S,
               {t_expr} AS T,
               {sk(0)} AS S1,
               {sk(1)} AS S2,
               {sk(2)} AS S3,
               {tk(0)} AS T1,
               {tk(1)} AS T2,
               {tk(2)} AS T3
        FROM (
            SELECT st.it, cc.*,
           {wcols}
            FROM st, cc WHERE st.it < {iters}
        ) inner_w
    ) sums
)
{final}
"""


ORACLE_SQL["fs_em_update"] = _fs_em_sql(1)
ORACLE_SQL["fellegi_sunter_em"] = _fs_em_sql(20)
ORACLE_SQL["fs_classify"] = _fs_em_sql(20, classify=True)

# Blocking-quality metrics: candidates from the same full-fidelity band
# keys as minhash_cluster_ids; truth = identical-text pairs via md5.
_BQ_TAIL = """, cand0 AS (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id < b.doc_id
), md AS (
    SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents
), cand AS (
    SELECT c.da, c.db, CASE WHEN x.h = y.h THEN 1 ELSE 0 END AS same
    FROM cand0 c JOIN md x ON x.doc_id = c.da JOIN md y ON y.doc_id = c.db
), tp AS (
    SELECT CAST(COALESCE(sum((m * (m - 1)) // 2), 0) AS BIGINT) AS n_true
    FROM (SELECT count(*) AS m FROM md GROUP BY h) g
), agg AS (
    SELECT (SELECT count(*) FROM documents) AS n_docs,
           (SELECT count(*) FROM cand) AS n_cand,
           (SELECT CAST(COALESCE(sum(same), 0) AS BIGINT) FROM cand) AS n_cov,
           (SELECT n_true FROM tp) AS n_true
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_cand AS BIGINT) AS n_cand_pairs,
       CAST(n_true AS BIGINT) AS n_true_pairs,
       CAST(n_cov AS BIGINT) AS n_covered,
       CAST(floor(1000000 * (1.0 - CASE WHEN n_docs >= 2
                 THEN CAST(n_cand AS DOUBLE)
                      / CAST((n_docs * (n_docs - 1)) // 2 AS DOUBLE)
                 ELSE 0.0 END) + 0.0000001) AS BIGINT) AS rr_micro,
       CAST(floor(1000000 * (CAST(n_cov AS DOUBLE)
                 / CAST(greatest(n_true, 1) AS DOUBLE)) + 0.0000001)
            AS BIGINT) AS pc_micro
FROM agg
"""

ORACLE_SQL["blocking_quality"] = _minhash_keys_sql().rstrip() + _BQ_TAIL

# DSIR importance weights: the bigram_lm_scores machinery twice — a
# target model (lang='en' slice) and the raw model — same fixed-point
# conditional probabilities; target-unseen bigrams contribute 0.
ORACLE_SQL["dsir_weights"] = """
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(
                   regexp_split_to_array(trim(COALESCE(text, '')),
                                         '\\s+'),
                   x -> x <> '') AS tk
        FROM documents
    ), tok AS (
        SELECT doc_id, lang, lower(tk[i]) AS w1, lower(tk[i+1]) AS w2
        FROM (
            SELECT doc_id, lang, tk, unnest(range(1, len(tk))) AS i
            FROM toks WHERE len(tk) >= 2
        )
    ), bg_r AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
        FROM tok GROUP BY 1, 2
    ), pref_r AS (
        SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_pref
        FROM bg_r GROUP BY 1
    ), bg_t AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
        FROM tok WHERE lang = 'en' GROUP BY 1, 2
    ), pref_t AS (
        SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_pref
        FROM bg_t GROUP BY 1
    ), scored AS (
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(COALESCE((bt.c_bg * 1000000) // pt.c_pref, 0))
                    AS BIGINT) AS ts,
               CAST(sum((br.c_bg * 1000000) // pr.c_pref) AS BIGINT) AS rs
        FROM tok t
        JOIN bg_r br ON br.w1 = t.w1 AND br.w2 = t.w2
        JOIN pref_r pr ON pr.w1 = t.w1
        LEFT JOIN bg_t bt ON bt.w1 = t.w1 AND bt.w2 = t.w2
        LEFT JOIN pref_t pt ON pt.w1 = t.w1
        GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(ts, 0) AS BIGINT) AS target_score,
           CAST(COALESCE(rs, 0) AS BIGINT) AS raw_score,
           CAST(COALESCE(ts, 0) - COALESCE(rs, 0) AS BIGINT) AS dsir_weight
    FROM documents d LEFT JOIN scored USING (doc_id)
    ORDER BY d.doc_id
"""

# Token-set similarity join: blocks on shared tokens, Dice in integer
# micro units (floor division both sides); single-space tokenization.
ORACLE_SQL["token_set_pairs"] = """
    WITH d AS (
        SELECT DISTINCT p_name FROM part
    ), t AS (
        SELECT p_name,
               unnest(list_distinct(list_filter(
                   string_split(p_name, ' '), x -> x <> ''))) AS tok
        FROM d
    ), n AS (
        SELECT p_name, CAST(count(*) AS BIGINT) AS ntok FROM t GROUP BY 1
    ), inter AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(count(*) AS BIGINT) AS ni
        FROM t a JOIN t b ON a.tok = b.tok AND a.p_name < b.p_name
        GROUP BY 1, 2
    )
    SELECT i.name_a, i.name_b, i.ni AS n_shared,
           CAST((2 * i.ni * 1000000) // (na.ntok + nb.ntok) AS BIGINT)
               AS dice_micro
    FROM inter i
    JOIN n na ON na.p_name = i.name_a
    JOIN n nb ON nb.p_name = i.name_b
    WHERE i.ni >= 1
    ORDER BY 1, 2
"""

# Distributed linear-model gradient step: integer features/labels/
# weights make the full-batch gradient order-free and hash-exact.
ORACLE_SQL["linreg_grad_step"] = """
    WITH f AS (
        SELECT doc_id,
               1 AS x_bias,
               len(regexp_split_to_array(trim(COALESCE(text, '')),
                                         '\\s+')) AS x_tok,
               length(COALESCE(text, ''))
                   - length(regexp_replace(COALESCE(text, ''),
                                           '[.,;:!?]', '', 'g')) AS x_punct,
               n_chars AS x_nch,
               CASE WHEN lang = 'en' THEN 1048576 ELSE 0 END AS y
        FROM documents
    ), r AS (
        SELECT *,
               (x_bias * 1024 + x_tok * 2048 + x_punct * 3072
                + x_nch * 4096) - y AS res
        FROM f
    ), g AS (
        SELECT 'bias' AS feature,
               CAST(sum(x_bias * res) AS BIGINT) AS grad,
               CAST(1024 AS BIGINT) AS w0 FROM r
        UNION ALL
        SELECT 'n_tokens', CAST(sum(x_tok * res) AS BIGINT), 2048 FROM r
        UNION ALL
        SELECT 'punct_chars', CAST(sum(x_punct * res) AS BIGINT), 3072 FROM r
        UNION ALL
        SELECT 'n_chars', CAST(sum(x_nch * res) AS BIGINT), 4096 FROM r
    )
    SELECT feature, grad, CAST(w0 - grad AS BIGINT) AS w_next
    FROM g ORDER BY feature
"""

# ER training pairs: (2i, 2i+1) positives + invertible modular
# negatives (i, i+37 mod n); comparison vectors as in the FS ops.
ORACLE_SQL["er_training_pairs"] = """
    WITH cnt AS (SELECT count(*) AS n FROM customer),
    feat AS (
        SELECT c_custkey, c_mktsegment, c_nationkey,
               CAST(floor(c_acctbal * 100) AS BIGINT) AS bal
        FROM customer
    ), pos AS (
        SELECT 'pos' AS pair_type, a.c_custkey AS key_a,
               b.c_custkey AS key_b,
               a.c_mktsegment AS sa, b.c_mktsegment AS sb,
               a.c_nationkey AS na, b.c_nationkey AS nb,
               a.bal AS ba, b.bal AS bb
        FROM feat a JOIN feat b ON b.c_custkey = a.c_custkey + 1
        WHERE a.c_custkey % 2 = 0
    ), neg AS (
        SELECT 'neg' AS pair_type, a.c_custkey AS key_a,
               b.c_custkey AS key_b,
               a.c_mktsegment, b.c_mktsegment,
               a.c_nationkey, b.c_nationkey, a.bal, b.bal
        FROM feat a
        JOIN cnt ON TRUE
        JOIN feat b ON b.c_custkey = (a.c_custkey + 37) % cnt.n
        WHERE a.c_custkey <> b.c_custkey
    ), u AS (
        SELECT * FROM pos UNION ALL SELECT * FROM neg
    )
    SELECT pair_type, key_a, key_b,
           CAST(CASE WHEN sa = sb THEN 1 ELSE 0 END AS BIGINT) AS g1,
           CAST(CASE WHEN na = nb THEN 1 ELSE 0 END AS BIGINT) AS g2,
           CAST(CASE WHEN abs(ba - bb) < 50000 THEN 1 ELSE 0 END
                AS BIGINT) AS g3
    FROM u ORDER BY 1, 2, 3
"""

# Tumbling-window event dedup counts; window = epoch-hour bucket.
ORACLE_SQL["window_dedup_stats"] = """
    WITH e AS (
        SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS w,
               user_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), k AS (
        SELECT w, user_id, event_type, cents,
               CAST(count(*) AS BIGINT) AS c
        FROM e GROUP BY 1, 2, 3, 4
    )
    SELECT w AS window_hour,
           CAST(sum(c) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(c) - count(*) AS BIGINT) AS n_dupes
    FROM k GROUP BY 1 ORDER BY 1
"""

# Cluster-size histogram over the same recursive-CTE closure as
# minhash_cluster_ids; log2 of an exact power of 2 is exact in both
# engines, so the bucket boundary cannot drift.
_MH_HIST_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), one AS (
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz
    FROM comp GROUP BY 1
)
SELECT CAST(floor(log2(sz)) AS BIGINT) AS log2_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs
FROM one GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["cluster_size_histogram"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _MH_HIST_TAIL
)

# Triangle count over the LSH candidate graph: distinct doc pairs
# sharing a recomputed MinHash band key (_minhash_keys_sql), then
# degree-(d, node) edge orientation, wedge = ordered out-neighbor
# pair, triangle = wedge whose closing directed edge exists.
# Row-value comparisons make the rank rule identical to the engine's
# lexsort((node, deg)).
_TRI_TAIL = """, e0 AS (
        SELECT DISTINCT least(a.doc_id, b.doc_id) AS s1,
               greatest(a.doc_id, b.doc_id) AS s2
        FROM keys a JOIN keys b
          ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT s1 AS node FROM e0
            UNION ALL SELECT s2 FROM e0
        ) GROUP BY 1
    ), dire AS (
        SELECT CASE WHEN (d1.d, e0.s1) < (d2.d, e0.s2)
                    THEN e0.s1 ELSE e0.s2 END AS u,
               CASE WHEN (d1.d, e0.s1) < (d2.d, e0.s2)
                    THEN e0.s2 ELSE e0.s1 END AS v
        FROM e0
        JOIN deg d1 ON d1.node = e0.s1
        JOIN deg d2 ON d2.node = e0.s2
    ), wedge AS (
        SELECT CASE WHEN (da.d, e1.v) < (db.d, e2.v)
                    THEN e1.v ELSE e2.v END AS x,
               CASE WHEN (da.d, e1.v) < (db.d, e2.v)
                    THEN e2.v ELSE e1.v END AS y
        FROM dire e1
        JOIN dire e2 ON e1.u = e2.u AND e1.v < e2.v
        JOIN deg da ON da.node = e1.v
        JOIN deg db ON db.node = e2.v
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedge) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT)
            FROM wedge w JOIN dire d ON d.u = w.x AND d.v = w.y
           ) AS n_triangles
"""

ORACLE_SQL["graph_triangles"] = _minhash_keys_sql().rstrip() + _TRI_TAIL

# Count-Min sketch: 60-bit md5 fold (the distinct_kmv idiom), buckets
# b_i = (h_lo + i*h_hi) mod 512 for rows i=0..3, cell sums over ALL
# tokens, point estimate = min over rows for the top-10 exact tokens.
ORACLE_SQL["countmin_estimates"] = """
    WITH tok AS (
        SELECT unnest(regexp_extract_all(
            COALESCE(text, ''),
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS token
        FROM documents
    ), cnt AS (
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY 1
    ), hv AS (
        SELECT token, n,
               list_reduce(
                   list_transform(
                       split(substr(md5(token), 1, 15), ''),
                       c -> CAST(strpos('0123456789abcdef', c) - 1 AS HUGEINT)),
                   (a, b) -> a * 16 + b) AS h
        FROM cnt
    ), cell AS (
        SELECT i.i AS row_i,
               (h % 1073741824 + i.i * (h // 1073741824)) % 512 AS b,
               CAST(sum(n) AS BIGINT) AS cn
        FROM hv CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
        GROUP BY 1, 2
    ), topq AS (
        SELECT token, n, h,
               row_number() OVER (ORDER BY n DESC, token ASC) AS rk
        FROM hv
    )
    SELECT t.token,
           t.n AS exact_n,
           CAST(min(c.cn) AS BIGINT) AS cms_est,
           CAST(min(c.cn) - t.n AS BIGINT) AS overcount
    FROM topq t
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i
    JOIN cell c ON c.row_i = i.i
       AND c.b = (t.h % 1073741824 + i.i * (t.h // 1073741824)) % 512
    WHERE t.rk <= 10
    GROUP BY 1, 2
"""

# Winsorized length stats: the event_value_percentiles integer rank
# rule over a (lang, n_chars) histogram, then the clipped integer sum.
ORACLE_SQL["winsorized_stats"] = """
    WITH h AS (
        SELECT lang, CAST(n_chars AS BIGINT) AS v,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ), c AS (
        SELECT lang, v, n,
               sum(n) OVER (PARTITION BY lang ORDER BY v) AS cum,
               sum(n) OVER (PARTITION BY lang) AS total
        FROM h
    ), b AS (
        SELECT lang,
               CAST(max(total) AS BIGINT) AS n,
               CAST(min(CASE WHEN cum >= (5 * total + 99) // 100
                        THEN v END) AS BIGINT) AS p5,
               CAST(min(CASE WHEN cum >= (95 * total + 99) // 100
                        THEN v END) AS BIGINT) AS p95
        FROM c GROUP BY 1
    )
    SELECT b.lang, b.n, b.p5, b.p95,
           CAST(sum(least(greatest(h.v, b.p5), b.p95) * h.n)
                AS BIGINT) AS wins_sum,
           CAST(sum(least(greatest(h.v, b.p5), b.p95) * h.n) * 1000
                // max(b.n) AS BIGINT) AS wins_mean_milli
    FROM h JOIN b USING (lang)
    GROUP BY 1, 2, 3, 4
"""

# Mixture balancing: keep the n_min smallest-sm64-rank docs per lang
# (salt 1004 = queries._BAL_SALT), n_min = the smallest lang's row count
# (same hash-priority rule as stratified_sample, data-dependent k).
ORACLE_SQL["balanced_sample"] = _STRH_PRELUDE + """
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1
    ), m AS (
        SELECT min(n) AS n_min FROM c
    ), r AS (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY sm64((CAST(doc_id AS HUGEINT) + 1004)
                                 % 18446744073709551616) // 16, doc_id
               ) AS rk
        FROM documents
    )
    SELECT r.lang, r.doc_id, CAST(r.rk AS BIGINT) AS sample_rank
    FROM r, m WHERE r.rk <= m.n_min
"""

# Per-lang OLS of BPE-token count on n_chars: exact HUGEINT sufficient
# statistics, closed-form slope/intercept via truncating integer
# division (DuckDB // truncates toward zero; the engine mirrors it).
ORACLE_SQL["lang_regression"] = """
    WITH t AS (
        SELECT lang,
               CAST(n_chars AS HUGEINT) AS x,
               CAST(len(regexp_extract_all(
                   COALESCE(text, ''),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS HUGEINT) AS y
        FROM documents
    ), s AS (
        SELECT lang, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM t GROUP BY 1
    )
    SELECT lang, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
                END AS BIGINT) AS slope_micro,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE (sy * (n * sxx - sx * sx)
                      - (n * sxy - sx * sy) * sx) * 1000
                     // ((n * sxx - sx * sx) * n)
                END AS BIGINT) AS intercept_milli
    FROM s ORDER BY lang
"""

# Time-decayed engagement: an event aged d whole days (epoch-us floor
# arithmetic — date_diff counts boundary crossings and would diverge)
# contributes 1000 // 2^(d // 7) milli-units; integer shifts both sides.
ORACLE_SQL["decayed_counts"] = """
    WITH mx AS (SELECT max(ts) AS tm FROM events),
    e AS (
        SELECT event_type,
               least((epoch_us(tm) - epoch_us(ts)) // 86400000000 // 7,
                     62) AS sh
        FROM events, mx
    )
    SELECT event_type,
           CAST(sum(1000 // (CAST(1 AS BIGINT) << sh)) AS BIGINT)
               AS decayed_milli,
           CAST(count(*) AS BIGINT) AS n_events
    FROM e GROUP BY 1
"""

# TPC-H Q5 local-supplier topology: revenue only where the ordering
# customer's nation equals the line supplier's nation.
ORACLE_SQL["regional_revenue"] = """
    SELECT n.n_name,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY 1 ORDER BY 1
"""

# Asymmetric containment over the LSH candidate pairs: distinct 8-gram
# shingle-hash sets per doc (the h CTE), pairs from shared band keys,
# containment = |A∩B|·10^6 // |A| (and // |B|) in micro-units. Band-key
# equality implies >= 1 shared shingle hash (equal MinHash minima under
# a bijective permutation), so the inner intersection join drops no
# candidate pair.
_CONT_TAIL = """, prs AS (
    SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
           greatest(a.doc_id, b.doc_id) AS id_b
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), sh AS (
    SELECT DISTINCT doc_id, hv FROM h
), sz AS (
    SELECT doc_id, CAST(count(*) AS HUGEINT) AS n FROM sh GROUP BY 1
), inter AS (
    SELECT p.id_a, p.id_b, CAST(count(*) AS HUGEINT) AS ni
    FROM prs p
    JOIN sh a ON a.doc_id = p.id_a
    JOIN sh b ON b.doc_id = p.id_b AND b.hv = a.hv
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, CAST(i.ni AS BIGINT) AS n_shared,
       CAST(i.ni * 1000000 // za.n AS BIGINT) AS cont_a_micro,
       CAST(i.ni * 1000000 // zb.n AS BIGINT) AS cont_b_micro
FROM inter i
JOIN sz za ON za.doc_id = i.id_a
JOIN sz zb ON zb.doc_id = i.id_b
"""

ORACLE_SQL["containment_pairs"] = _minhash_keys_sql().rstrip() + _CONT_TAIL

# Exact integer 3-sigma outlier counts per lang: the z^2 > 9 inequality
# cleared of divisions/roots — (x*n - sx)^2 > 9*n*(n*sxx - sx^2) in
# HUGEINT on both sides.
ORACLE_SQL["length_outliers"] = """
    WITH s AS (
        SELECT lang, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(n_chars AS HUGEINT)) AS sx,
               sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS sxx
        FROM documents GROUP BY 1
    )
    SELECT d.lang, CAST(s.n AS BIGINT) AS n,
           CAST(sum(CASE WHEN
                (CAST(d.n_chars AS HUGEINT) * s.n - s.sx)
              * (CAST(d.n_chars AS HUGEINT) * s.n - s.sx)
              > 9 * (s.n * s.sxx - s.sx * s.sx)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d JOIN s ON s.lang = d.lang
    GROUP BY 1, 2
"""

# Anti-entropy partition fingerprints: order-independent additive
# (sum mod 2^60) and xor digests over strh60 text hashes per source.
ORACLE_SQL["partition_digests"] = """
    WITH h AS (
        SELECT source,
               CAST(strh60(COALESCE(text, '')) AS HUGEINT) AS hv
        FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(hv) % 1152921504606846976 AS BIGINT) AS digest_sum,
           bit_xor(CAST(hv AS BIGINT)) AS digest_xor
    FROM h GROUP BY 1
"""

# Crawl-fragment stitching: docs whose last 3 space-tokens equal
# another doc's first 3 (both docs >= 6 tokens).
ORACLE_SQL["fragment_stitching"] = """
    WITH tok AS (
        SELECT doc_id,
               regexp_extract_all(COALESCE(text, ''), '[^ ]+') AS w
        FROM documents
    ), t AS (
        SELECT doc_id,
               array_to_string(w[1:3], ' ') AS head,
               array_to_string(w[-3:], ' ') AS tail
        FROM tok WHERE len(w) >= 6
    )
    SELECT a.doc_id AS id_from, b.doc_id AS id_to, a.tail AS boundary
    FROM t a JOIN t b ON a.tail = b.head AND a.doc_id <> b.doc_id
"""

# Golden-record survivorship over the LSH clusters: same closure as
# minhash_cluster_ids, then per-cluster per-field survival — modal lang
# / source (tie -> lexicographically smallest via row_number), min doc
# id, summed chars.
_GOLDEN_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), j AS (
    SELECT c.cluster_id, d.doc_id, d.lang, d.source, d.n_chars
    FROM comp c JOIN documents d ON d.doc_id = c.doc_id
), lm AS (
    SELECT cluster_id, lang AS golden_lang FROM (
        SELECT cluster_id, lang,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY count(*) DESC, lang ASC
               ) AS rk
        FROM j GROUP BY cluster_id, lang
    ) WHERE rk = 1
), sm AS (
    SELECT cluster_id, source AS golden_source FROM (
        SELECT cluster_id, source,
               row_number() OVER (
                   PARTITION BY cluster_id ORDER BY count(*) DESC, source ASC
               ) AS rk
        FROM j GROUP BY cluster_id, source
    ) WHERE rk = 1
), g AS (
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS rep_doc,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM j GROUP BY 1
)
SELECT g.cluster_id, g.n_docs, g.rep_doc, lm.golden_lang,
       sm.golden_source, g.total_chars
FROM g JOIN lm USING (cluster_id) JOIN sm USING (cluster_id)
"""

ORACLE_SQL["golden_records"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _GOLDEN_TAIL
)

# American Soundex in pure SQL: strip non-letters, map vowels to 0 /
# consonants to their class digit / drop H+W (translate removes chars
# past the to-string), collapse adjacent equal codes, drop the leading
# run's code, strip zeros, pad to letter + 3 digits.
ORACLE_SQL["soundex_blocks"] = """
    WITH s AS (
        SELECT p_name,
               regexp_replace(upper(p_name), '[^A-Z]', '', 'g') AS clean
        FROM part
    ), m AS (
        -- RE2 has no backreferences: collapse each digit class's runs
        -- with its own literal pattern instead of (.)\1+
        SELECT p_name, clean,
               regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                   translate(clean,
                       'AEIOUYBFPVCGJKQSXZDTLMNRHW',
                       '000000111122222222334556'),
                   '0{2,}', '0', 'g'), '1{2,}', '1', 'g'),
                   '2{2,}', '2', 'g'), '3{2,}', '3', 'g'),
                   '4{2,}', '4', 'g'), '5{2,}', '5', 'g'),
                   '6{2,}', '6', 'g') AS collapsed
        FROM s
    ), c AS (
        SELECT p_name,
               substr(clean, 1, 1) ||
               substr(
                   replace(substr(collapsed, 2), '0', '') || '000',
                   1, 3) AS code
        FROM m WHERE clean <> ''
    ), names AS (
        SELECT code, p_name, CAST(count(*) AS BIGINT) AS n
        FROM c GROUP BY 1, 2
    )
    SELECT code,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(n) AS BIGINT) AS n_rows,
           CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_cand_pairs,
           min(p_name) AS first_name
    FROM names GROUP BY 1
"""


def _build_kcore_sql(k: int = 3, rounds: int = 8) -> str:
    """k-core of the LSH candidate graph as a FIXED unrolled peel:
    round i keeps nodes whose degree in the round-(i-1) subgraph is
    >= k, then edges whose endpoints both survive. Peeling is monotone,
    so once the fixpoint is reached (round 6 on the test corpus) the
    remaining rounds are no-ops and the unroll equals the true core.
    Every CTE is MATERIALIZED — each round references its predecessor
    three times, and DuckDB's default inlining would re-expand the
    whole chain 3^rounds times."""
    sql = _minhash_keys_sql().rstrip() + """
, e0 AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
)"""
    prev = "e0"
    for i in range(1, rounds + 1):
        sql += f""",
n{i} AS MATERIALIZED (
    SELECT u FROM {prev} GROUP BY u HAVING count(*) >= {k}
),
e{i} AS MATERIALIZED (
    SELECT e.u, e.v FROM {prev} e
    JOIN n{i} x ON e.u = x.u JOIN n{i} y ON e.v = y.u
)"""
        prev = f"e{i}"
    sql += f"""
SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
FROM {prev} GROUP BY u ORDER BY doc_id
"""
    return sql


ORACLE_SQL["kcore_nodes"] = _build_kcore_sql()

# TF-IDF cosine similarity join over token bigrams, exact in integers:
# w = tf * (10000 // df); cos >= 0.4 decided as 25*cross^2 >= 4*n2a*n2b
# in HUGEINT (cross >= 0 for non-negative weights, so squaring is
# monotone). Candidates block on rare bigrams (2 <= df <= 20), ordered
# and capped to mirror the Ray side's deterministic cap.
ORACLE_SQL["tfidf_cosine_pairs"] = r"""
WITH toks AS MATERIALIZED (
    SELECT doc_id, regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS w
    FROM documents
), ix AS MATERIALIZED (
    SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
    FROM toks WHERE len(w) >= 2 AND w[1] <> ''
), tok AS MATERIALIZED (
    SELECT doc_id, w[i] || ' ' || w[i + 1] AS term,
           CAST(count(*) AS BIGINT) AS tf
    FROM ix GROUP BY 1, 2
), dfp AS MATERIALIZED (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1
), wt AS MATERIALIZED (
    SELECT doc_id, tok.term, tf * (10000 // df) AS w, df
    FROM tok JOIN dfp ON tok.term = dfp.term
), cand AS MATERIALIZED (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM wt a JOIN wt b ON a.term = b.term AND a.doc_id < b.doc_id
    WHERE a.df BETWEEN 2 AND 20
    ORDER BY da, db LIMIT 20000
), nrm AS MATERIALIZED (
    SELECT doc_id, CAST(sum(CAST(w AS HUGEINT) * w) AS HUGEINT) AS n2
    FROM wt GROUP BY 1
), x AS MATERIALIZED (
    SELECT c.da, c.db,
           CAST(sum(CAST(p.w AS HUGEINT) * q.w) AS HUGEINT) AS cr
    FROM cand c
    JOIN wt p ON p.doc_id = c.da
    JOIN wt q ON q.doc_id = c.db AND q.term = p.term
    GROUP BY 1, 2
)
SELECT x.da AS doc_a, x.db AS doc_b, CAST(x.cr AS BIGINT) AS cross_w,
       CAST(CASE WHEN 25 * x.cr * x.cr >= 4 * na.n2 * nb.n2
                 THEN 1 ELSE 0 END AS BIGINT) AS is_sim
FROM x JOIN nrm na ON na.doc_id = x.da JOIN nrm nb ON nb.doc_id = x.db
ORDER BY doc_a, doc_b
"""

# 1-to-1 mutual best match: block (lang, n_chars//64), score |len diff|,
# per-doc argmin with (diff, partner_id) tie-break, keep mutual pairs.
ORACLE_SQL["one_to_one_match"] = """
    WITH d AS (
        SELECT doc_id, lang, n_chars, n_chars // 64 AS bkt
        FROM documents
    ), p AS (
        SELECT a.doc_id AS src, b.doc_id AS dst, a.lang AS lang,
               abs(a.n_chars - b.n_chars) AS diff
        FROM d a JOIN d b
          ON a.lang = b.lang AND a.bkt = b.bkt AND a.doc_id <> b.doc_id
    ), best AS (
        SELECT src, dst, diff, lang,
               row_number() OVER (
                   PARTITION BY src ORDER BY diff, dst
               ) AS rk
        FROM p
    ), b1 AS (
        SELECT src, dst, diff, lang FROM best WHERE rk = 1
    )
    SELECT CAST(x.src AS BIGINT) AS doc_a,
           CAST(x.dst AS BIGINT) AS doc_b,
           CAST(x.diff AS BIGINT) AS len_diff,
           x.lang
    FROM b1 x JOIN b1 y ON y.src = x.dst AND y.dst = x.src
    WHERE x.src < x.dst
    ORDER BY doc_a, doc_b
"""

# Prefix-filtered (AllPairs) threshold similarity self-join over
# word-4-gram shingle sets: the oracle is the direct quadratic join, so
# hash parity proves the prefix filter missed no threshold pair.
ORACLE_SQL["prefix_filter_pairs"] = r"""
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\s+'),
                           x -> x <> '') AS ws
        FROM documents
    ), t AS (
        SELECT doc_id,
               list_distinct(
                   [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                    FOR i IN range(1, len(ws) - 2)]
               ) AS toks
        FROM w WHERE len(ws) >= 4
    ), p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.toks, b.toks)) AS ni,
               len(a.toks) AS na, len(b.toks) AS nb
        FROM t a JOIN t b ON a.doc_id < b.doc_id
    )
    SELECT CAST(doc_a AS BIGINT) AS doc_a,
           CAST(doc_b AS BIGINT) AS doc_b,
           CAST(ni AS BIGINT) AS ni,
           CAST(na AS BIGINT) AS na,
           CAST(nb AS BIGINT) AS nb,
           CAST(ni * 1000000 // (na + nb - ni) AS BIGINT) AS jacc_micro
    FROM p
    WHERE 2 * ni >= na + nb - ni
    ORDER BY doc_a, doc_b
"""

# Range-partitioner boundary planning: boundaries are the keys at ranks
# ceil(i*n/B) (quantile_disc rule, integer arithmetic), deduplicated;
# a row's partition is #{bounds <= key} (searchsorted side='right').
ORACLE_SQL["range_partition_balance"] = """
    WITH k AS (SELECT o_custkey AS key FROM orders),
    n AS (SELECT count(*) AS n FROM k),
    r AS (SELECT key, row_number() OVER (ORDER BY key) AS rn FROM k),
    tgt AS (
        SELECT CAST((i * n.n + 15) // 16 AS BIGINT) AS rk
        FROM range(1, 16) t(i), n
    ),
    bounds AS (
        SELECT DISTINCT r.key AS bkey FROM tgt JOIN r ON r.rn = tgt.rk
    ),
    assigned AS (
        SELECT key,
               (SELECT count(*) FROM bounds b WHERE b.bkey <= k.key) AS p
        FROM k
    )
    SELECT CAST(p AS BIGINT) AS partition_id,
           count(*)          AS n_rows,
           min(key)          AS key_min,
           max(key)          AS key_max
    FROM assigned GROUP BY p ORDER BY p
"""

# Zone-map data-skipping audit: same splitmix64 macro family as the
# winnow/simhash oracles; a bucket is touched iff its [min,max] day zone
# intersects the predicate window.
ORACLE_SQL["zonemap_pruning"] = """
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH o AS (
    SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS day,
           o_orderkey
    FROM orders
), win AS (
    SELECT (DATE '1998-06-01' - DATE '1970-01-01') AS lo,
           (DATE '1998-06-30' - DATE '1970-01-01') AS hi
), b AS (
    SELECT 'date_week' AS layout, CAST(day // 7 AS BIGINT) AS bucket, day FROM o
    UNION ALL
    SELECT 'hash' AS layout, CAST(sm64(o_orderkey) % 64 AS BIGINT) AS bucket, day FROM o
), z AS (
    SELECT layout, bucket, count(*) AS n, min(day) AS dmin, max(day) AS dmax,
           CAST(sum(CASE WHEN day BETWEEN win.lo AND win.hi THEN 1 ELSE 0 END) AS BIGINT) AS nmatch
    FROM b, win GROUP BY layout, bucket
)
SELECT layout,
       count(*) AS n_buckets,
       CAST(sum(CASE WHEN dmax >= win.lo AND dmin <= win.hi THEN 1 ELSE 0 END) AS BIGINT) AS buckets_touched,
       CAST(sum(CASE WHEN dmax >= win.lo AND dmin <= win.hi THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(sum(nmatch) AS BIGINT) AS rows_matched
FROM z, win GROUP BY layout ORDER BY layout
"""

# KMV join-cardinality estimate: k=256 smallest sm64 hashes per side;
# estimator integer-exact (HUGEINT // both sides); exact counts ride
# along as the accuracy audit.
ORACLE_SQL["kmv_join_estimate"] = """
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH a AS (SELECT DISTINCT sm64(o_custkey) AS h FROM orders),
b AS (SELECT DISTINCT sm64(c_custkey) AS h FROM customer),
ka AS (SELECT h FROM a ORDER BY h LIMIT 256),
kb AS (SELECT h FROM b ORDER BY h LIMIT 256),
u AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) t),
nu AS (SELECT count(*) AS cnt FROM u),
tau AS (SELECT h AS t FROM u ORDER BY h LIMIT 1 OFFSET 255),
eu AS (
    SELECT CASE WHEN nu.cnt >= 256
        THEN (CAST(255 AS HUGEINT) * CAST(18446744073709551616 AS HUGEINT))
             // (SELECT t FROM tau)
        ELSE CAST(nu.cnt AS HUGEINT) END AS v
    FROM nu
),
ei AS (
    SELECT CASE WHEN nu.cnt >= 256
        THEN (CAST((SELECT count(*) FROM ka JOIN kb USING (h), tau
                    WHERE h <= tau.t) AS HUGEINT)
              * (SELECT v FROM eu)) // 256
        ELSE CAST((SELECT count(*) FROM ka JOIN kb USING (h)) AS HUGEINT)
        END AS v
    FROM nu
)
SELECT CAST(256 AS BIGINT) AS k,
       CAST((SELECT v FROM eu) AS BIGINT) AS est_union,
       CAST((SELECT v FROM ei) AS BIGINT) AS est_inter,
       (SELECT count(DISTINCT key) FROM (
            SELECT o_custkey AS key FROM orders
            UNION ALL SELECT c_custkey FROM customer) t) AS exact_union,
       (SELECT count(*) FROM
            (SELECT DISTINCT o_custkey AS key FROM orders) oa
            JOIN (SELECT DISTINCT c_custkey AS key FROM customer) cb
            USING (key)) AS exact_inter
"""

# Watermark late-data audit: arrival = event time + sm64(event_id) % 2h
# (deterministic simulated network delay); watermark = running max
# event-time of PRIOR arrivals per user, minus 15 min.
ORACLE_SQL["late_event_stats"] = """
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH e AS (
    SELECT event_type, user_id, event_id, epoch_us(ts) AS t,
           epoch_us(ts) + CAST(sm64(event_id) % 7200000000 AS BIGINT) AS arr
    FROM events
), w AS (
    SELECT event_type, t,
           max(t) OVER (
               PARTITION BY user_id ORDER BY arr, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS wm
    FROM e
)
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CASE WHEN wm - 900000000 > t THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(max(CASE WHEN wm - 900000000 > t THEN wm - 900000000 - t
                     ELSE 0 END) AS BIGINT) AS max_lateness_us
FROM w GROUP BY event_type ORDER BY event_type
"""

# Rendezvous-hashing rebalance audit: shard = argmax over nodes of
# sm64(sm64(key) XOR sm64(node)); moved-in mass lands only on new nodes.
ORACLE_SQL["rendezvous_rebalance"] = """
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % 18446744073709551616);
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % 18446744073709551616)));
WITH k AS (SELECT o_orderkey AS key FROM orders),
n AS (SELECT i AS node FROM range(0, 20) t(i)),
w AS (SELECT key, node, sm64(xr(sm64(key), sm64(node))) AS wt FROM k, n),
a20 AS (
    SELECT key, node AS n20 FROM (
        SELECT key, node,
               row_number() OVER (PARTITION BY key ORDER BY wt DESC, node) AS rn
        FROM w
    ) WHERE rn = 1
),
a16 AS (
    SELECT key, node AS n16 FROM (
        SELECT key, node,
               row_number() OVER (PARTITION BY key ORDER BY wt DESC, node) AS rn
        FROM w WHERE node < 16
    ) WHERE rn = 1
),
j AS (SELECT n16, n20 FROM a20 JOIN a16 USING (key))
SELECT n.node,
       CAST(COALESCE(sum(CASE WHEN j.n16 = n.node THEN 1 END), 0) AS BIGINT)
           AS n_under_16,
       CAST(COALESCE(sum(CASE WHEN j.n20 = n.node THEN 1 END), 0) AS BIGINT)
           AS n_under_20,
       CAST(COALESCE(sum(CASE WHEN j.n20 = n.node AND j.n16 <> j.n20
                               THEN 1 END), 0) AS BIGINT) AS n_moved_in
FROM n LEFT JOIN j ON (j.n16 = n.node OR j.n20 = n.node)
GROUP BY n.node ORDER BY n.node
"""

# Trigram-filtered substring search: oracle is the direct scan; parity
# proves the trigram conjunction misses no true match.
ORACLE_SQL["trigram_search"] = """
    SELECT doc_id,
           CAST((length(text) - length(replace(text, 'merge part', '')))
                // length('merge part') AS BIGINT) AS n_occurrences
    FROM documents
    WHERE position('merge part' IN text) > 0
    ORDER BY doc_id
"""

# Canonical snap (P3): DuckDB's jaro_winkler_similarity (rapidfuzz,
# prefix boost only above jaro 0.7 — mirrored on the Ray side), integer
# micro-units with the +1e-7 epsilon, argmax tie-break (jw DESC, cand
# ASC) identical on both engines.
ORACLE_SQL["canonical_snap"] = """
    WITH d AS (SELECT DISTINCT p_name FROM part),
    inputs AS (
        SELECT p_name AS input_name FROM d
        UNION
        SELECT regexp_replace(p_name, '[aeiou]', '', 'g') FROM d
    ),
    scored AS (
        SELECT i.input_name, d.p_name AS cand,
               CAST(floor(jaro_winkler_similarity(i.input_name, d.p_name)
                          * 1000000 + 0.0000001) AS BIGINT) AS jw,
               row_number() OVER (
                   PARTITION BY i.input_name
                   ORDER BY floor(jaro_winkler_similarity(i.input_name,
                                  d.p_name) * 1000000 + 0.0000001) DESC,
                            d.p_name) AS rn
        FROM inputs i CROSS JOIN d
    ),
    best AS (SELECT input_name, cand, jw FROM scored WHERE rn = 1)
    SELECT input_name,
           CASE WHEN jw >= 890000 THEN cand END AS snapped,
           jw AS jw_micro,
           CASE WHEN jw = 1000000 THEN 'exact'
                WHEN jw >= 890000 THEN 'fuzzy'
                ELSE 'none' END AS method
    FROM best ORDER BY input_name
"""

# Component-signature blocking (M19): initials / joined / first-token
# signature variants over the distinct-name panel.
ORACLE_SQL["signature_blocks"] = """
    WITH d AS (SELECT DISTINCT p_name FROM part),
    sigs AS (
        SELECT 'initials' AS kind,
               array_to_string(list_transform(string_split(p_name, ' '),
                                              x -> substr(x, 1, 1)), '')
                   AS sig,
               p_name
        FROM d
        UNION ALL
        SELECT 'joined', replace(p_name, ' ', ''), p_name FROM d
        UNION ALL
        SELECT 'prefix', string_split(p_name, ' ')[1], p_name FROM d
    )
    SELECT kind, sig,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(count(*) * (count(*) - 1) / 2 AS BIGINT) AS n_pairs,
           min(p_name) AS rep
    FROM sigs GROUP BY 1, 2 HAVING count(*) >= 2 ORDER BY 1, 2
"""

# Spec-driven token transforms (M14): lower / strip_accents / alnum
# applied to the exploded ASCII-\s+ token stream; per-(spec, lang)
# token and changed counts.
ORACLE_SQL["token_transforms"] = """
    WITH toks AS (
        SELECT lang,
               unnest(regexp_split_to_array(trim(COALESCE(text, '')),
                                            '\\s+')) AS tok
        FROM documents
    ), t AS (SELECT lang, tok FROM toks WHERE tok != ''),
    s AS (
        SELECT 'lower' AS spec, lang, tok, lower(tok) AS after FROM t
        UNION ALL
        SELECT 'fold', lang, tok, strip_accents(tok) FROM t
        UNION ALL
        SELECT 'alnum', lang, tok,
               regexp_replace(lower(tok), '[^a-z0-9]', '', 'g') FROM t
    )
    SELECT spec, lang,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN after <> tok THEN 1 ELSE 0 END) AS BIGINT)
               AS n_changed
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
"""

# Cluster medoid election: the recursive closure (minhash_cluster_ids)
# + distinct shingle-hash sets (containment_pairs) + per-cluster argmax
# of summed integer micro-Jaccard. Member cap 256 in doc_id order
# mirrors the Ray side's deterministic cap.
_MEDOID_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), mem AS (
    SELECT doc_id, cluster_id,
           row_number() OVER (PARTITION BY cluster_id ORDER BY doc_id) AS rn,
           count(*) OVER (PARTITION BY cluster_id) AS csz
    FROM comp
), m2 AS (
    SELECT doc_id, cluster_id FROM mem WHERE csz >= 2 AND rn <= 256
), sh AS (
    SELECT DISTINCT doc_id, hv FROM h
), sz AS (
    SELECT doc_id, CAST(count(*) AS HUGEINT) AS n FROM sh GROUP BY 1
), prs AS (
    SELECT a.doc_id AS ia, b.doc_id AS ib, a.cluster_id
    FROM m2 a JOIN m2 b
      ON a.cluster_id = b.cluster_id AND a.doc_id <> b.doc_id
), inter AS (
    SELECT p.ia, p.cluster_id, p.ib, CAST(count(*) AS HUGEINT) AS ni
    FROM prs p
    JOIN sh x ON x.doc_id = p.ia
    JOIN sh y ON y.doc_id = p.ib AND y.hv = x.hv
    GROUP BY 1, 2, 3
), jpp AS (
    SELECT i.ia, i.cluster_id,
           sum(CAST(i.ni * 1000000 // (za.n + zb.n - i.ni) AS BIGINT))
               AS score
    FROM inter i
    JOIN sz za ON za.doc_id = i.ia
    JOIN sz zb ON zb.doc_id = i.ib
    GROUP BY 1, 2
), allm AS (
    SELECT m2.doc_id AS ia, m2.cluster_id, COALESCE(j.score, 0) AS score
    FROM m2 LEFT JOIN jpp j
      ON j.ia = m2.doc_id AND j.cluster_id = m2.cluster_id
), best AS (
    SELECT cluster_id, ia AS medoid_id, score,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY score DESC, ia) AS rn
    FROM allm
), csize AS (
    SELECT cluster_id, count(*) AS nm FROM m2 GROUP BY 1
)
SELECT b.cluster_id, b.medoid_id,
       CAST(b.score AS BIGINT) AS score_micro,
       CAST(c.nm AS BIGINT) AS n_members
FROM best b JOIN csize c USING (cluster_id)
WHERE b.rn = 1 ORDER BY b.cluster_id
"""

ORACLE_SQL["cluster_medoids"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _MEDOID_TAIL
)

# Interval sweep-line: lag-gap sessionization, sessions split across
# day boundaries via generate_series, per-day running-sum sweep with
# the (+1 before -1 at equal t) tie rule pinned by ORDER BY t, d DESC.
ORACLE_SQL["session_concurrency"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    o AS (
        SELECT user_id, t,
               lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt
        FROM e
    ),
    m AS (
        SELECT user_id, t,
               CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1
                    ELSE 0 END AS brk
        FROM o
    ),
    s AS (
        SELECT user_id, t,
               sum(brk) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    ),
    sess AS (
        SELECT user_id, sid, min(t) AS st, max(t) AS en
        FROM s GROUP BY 1, 2
    ),
    days AS (
        SELECT st, en,
               unnest(generate_series(st // 86400000000,
                                      en // 86400000000)) AS day
        FROM sess
    ),
    clip AS (
        SELECT day,
               greatest(st, day * 86400000000) AS cst,
               least(en, day * 86400000000 + 86399999999) AS cen
        FROM days
    ),
    b AS (
        SELECT day, cst AS t, 1 AS d FROM clip
        UNION ALL
        SELECT day, cen, -1 FROM clip
    ),
    r AS (
        SELECT day,
               sum(d) OVER (PARTITION BY day ORDER BY t, d DESC
                            ROWS UNBOUNDED PRECEDING) AS conc
        FROM b
    )
    SELECT CAST(c.day AS BIGINT) AS day_epoch,
           CAST(c.n AS BIGINT) AS n_sessions,
           CAST(x.mx AS BIGINT) AS max_concurrent
    FROM (SELECT day, count(*) AS n FROM clip GROUP BY 1) c
    JOIN (SELECT day, max(conc) AS mx FROM r GROUP BY 1) x USING (day)
    ORDER BY 1
"""

# Balanced shard assignment: size-rank round-robin striping.
ORACLE_SQL["shard_balance"] = """
    WITH d AS (
        SELECT doc_id,
               octet_length(CAST(COALESCE(text, '') AS BLOB)) AS n_bytes
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_bytes,
               row_number() OVER (ORDER BY n_bytes DESC, doc_id) AS rn
        FROM d
    ),
    a AS (SELECT (rn - 1) % 16 AS shard, n_bytes FROM r)
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(min(n_bytes) AS BIGINT) AS min_bytes,
           CAST(max(n_bytes) AS BIGINT) AS max_bytes
    FROM a GROUP BY 1 ORDER BY 1
"""

# INT8 quantization audit: per-dim affine quantize on the milli-grid;
# all division operands nonnegative so // semantics agree.
ORACLE_SQL["embedding_quantize"] = """
    WITH v AS (
        SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ), m AS (
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xm
        FROM v
    ), mm AS (
        SELECT dim, min(xm) AS mn, max(xm) AS mx FROM m GROUP BY 1
    ), qq AS (
        SELECT m.dim, m.xm, mm.mn, mm.mx,
               CASE WHEN mm.mx > mm.mn
                    THEN (m.xm - mm.mn) * 255 // (mm.mx - mm.mn)
                    ELSE 0 END AS q
        FROM m JOIN mm USING (dim)
    ), r AS (
        SELECT dim, xm, q, mn + q * (mx - mn) // 255 AS recon FROM qq
    )
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(abs(xm - recon)) AS BIGINT) AS sum_abs_err_milli,
           CAST(max(abs(xm - recon)) AS BIGINT) AS max_abs_err_milli
    FROM r GROUP BY 1 ORDER BY 1
"""

# Full-outer cross-system reconciliation: urgent orders vs purchase
# events per key, null-filled and side-classified.
ORACLE_SQL["activity_reconcile"] = """
    WITH l AS (
        SELECT o_custkey AS k, count(*) AS n
        FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
    ),
    r AS (
        SELECT user_id AS k, count(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(l.k, r.k) AS user_key,
           CAST(COALESCE(l.n, 0) AS BIGINT) AS n_urgent_orders,
           CAST(COALESCE(r.n, 0) AS BIGINT) AS n_purchases,
           CASE WHEN l.k IS NULL THEN 'events_only'
                WHEN r.k IS NULL THEN 'orders_only'
                ELSE 'both' END AS side
    FROM l FULL OUTER JOIN r ON l.k = r.k
    ORDER BY 1
"""

# m-estimate smoothed source quality: shrink per-source mean length
# toward the corpus mean with m = 50 pseudo-counts, milli-integer.
ORACLE_SQL["source_quality_prior"] = """
    WITH d AS (
        SELECT source, length(COALESCE(text, '')) AS L FROM documents
    ),
    s AS (
        SELECT source, CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(L) AS HUGEINT) AS sl
        FROM d GROUP BY 1
    ),
    g AS (
        SELECT sum(sl) * 1000 // sum(n) AS prior FROM s
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_docs,
           CAST(sl * 1000 // n AS BIGINT) AS mean_len_milli,
           CAST((sl * 1000 + 50 * prior) // (n + 50) AS BIGINT)
               AS smoothed_milli
    FROM s, g ORDER BY 1
"""

# Dedup ROI: per-source byte savings of exact dedup; identical texts
# have identical lengths so totals fold from the distinct-text panel.
ORACLE_SQL["dedup_savings"] = """
    WITH d AS (
        SELECT source, md5(COALESCE(text, '')) AS h,
               octet_length(CAST(COALESCE(text, '') AS BLOB)) AS nb
        FROM documents
    ),
    g AS (
        SELECT source, h, CAST(count(*) AS HUGEINT) AS n,
               CAST(min(nb) AS HUGEINT) AS nb
        FROM d GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(n * nb) AS BIGINT) AS bytes_total,
           CAST(sum(nb) AS BIGINT) AS bytes_unique,
           CAST((sum(n * nb) - sum(nb)) * 1000000
                // greatest(sum(n * nb), 1) AS BIGINT) AS saved_ppm
    FROM g GROUP BY 1 ORDER BY 1
"""

# Association lift over the top-32 vocabulary: integer ppm lift —
# nb·N·10^6 // (na·nb) — no float probability on either engine.
ORACLE_SQL["token_lift"] = """
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS tok
        FROM documents
    ), tc AS (
        SELECT tok, count(*) AS n FROM toks WHERE tok != '' GROUP BY 1
    ), top AS (
        SELECT tok FROM tc ORDER BY n DESC, tok LIMIT 32
    ), dt AS (
        SELECT DISTINCT doc_id, tok FROM toks
        WHERE tok IN (SELECT tok FROM top)
    ), cnt AS (
        SELECT tok, CAST(count(*) AS HUGEINT) AS n FROM dt GROUP BY 1
    ), nd AS (
        SELECT CAST(count(*) AS HUGEINT) AS n FROM documents
    ), prs AS (
        SELECT a.tok AS ta, b.tok AS tb, CAST(count(*) AS HUGEINT) AS nb
        FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2
    )
    SELECT p.ta AS tok_a, p.tb AS tok_b,
           CAST(p.nb AS BIGINT) AS n_docs_both,
           CAST(p.nb * nd.n * 1000000 // (ca.n * cb.n) AS BIGINT)
               AS lift_ppm
    FROM prs p
    JOIN cnt ca ON ca.tok = p.ta
    JOIN cnt cb ON cb.tok = p.tb, nd
    ORDER BY 1, 2
"""

# 2-D decile contingency: integer rank-rule boundaries per axis,
# bucket = count of boundaries strictly below the value.
ORACLE_SQL["decile_grid"] = """
    WITH d AS (
        SELECT length(COALESCE(text, '')) AS nc,
               len(list_filter(
                   regexp_split_to_array(trim(COALESCE(text, '')), '\\s+'),
                   x -> x != '')) AS nt
        FROM documents
    ),
    ps AS (SELECT unnest([10,20,30,40,50,60,70,80,90]) AS p),
    hx AS (SELECT nc AS v, count(*) AS n FROM d GROUP BY 1),
    cx AS (
        SELECT v, sum(n) OVER (ORDER BY v) AS cum, sum(n) OVER () AS total
        FROM hx
    ),
    bx AS (
        SELECT p, min(CASE WHEN cum >= (p * total + 99) // 100 THEN v END)
                   AS b
        FROM cx, ps GROUP BY p
    ),
    hy AS (SELECT nt AS v, count(*) AS n FROM d GROUP BY 1),
    cy AS (
        SELECT v, sum(n) OVER (ORDER BY v) AS cum, sum(n) OVER () AS total
        FROM hy
    ),
    byy AS (
        SELECT p, min(CASE WHEN cum >= (p * total + 99) // 100 THEN v END)
                   AS b
        FROM cy, ps GROUP BY p
    ),
    assigned AS (
        SELECT (SELECT count(*) FROM bx WHERE bx.b < d.nc) AS xd,
               (SELECT count(*) FROM byy WHERE byy.b < d.nt) AS yd
        FROM d
    )
    SELECT CAST(xd AS BIGINT) AS x_decile,
           CAST(yd AS BIGINT) AS y_decile,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM assigned GROUP BY 1, 2 ORDER BY 1, 2
"""

# Review-pair sampling: rep-vs-member pairs per non-singleton LSH
# cluster, top-2 by md5 hash priority of the member id.
_REVIEW_TAIL = """, edges AS (
    SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), reach AS (
    SELECT doc_id AS id, doc_id AS lab FROM documents
    UNION
    SELECT e.dst AS id, r.lab
    FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
    SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), mem AS (
    SELECT doc_id, cluster_id,
           min(doc_id) OVER (PARTITION BY cluster_id) AS rep,
           count(*) OVER (PARTITION BY cluster_id) AS csz
    FROM comp
), cand AS (
    SELECT cluster_id, rep AS id_a, doc_id AS id_b,
           sm64((CAST(doc_id AS HUGEINT) + 1005)
                % 18446744073709551616) // 16 AS pri
    FROM mem WHERE csz >= 2 AND doc_id <> rep
), ranked AS (
    SELECT cluster_id, id_a, id_b,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY pri, id_b) AS rk
    FROM cand
)
SELECT cluster_id, id_a, id_b, CAST(rk AS BIGINT) AS pick_rank
FROM ranked WHERE rk <= 2 ORDER BY 1, 4
"""

ORACLE_SQL["review_pairs"] = (
    _minhash_keys_sql(recursive=True).rstrip() + _REVIEW_TAIL
)

# Gap-filled hourly series: dense (type, hour) grid over the global
# span, zero-filled LEFT JOIN; hours as epoch-hour BIGINTs.
ORACLE_SQL["events_hourly_dense"] = """
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
    ),
    c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
    sp AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    t AS (SELECT DISTINCT event_type FROM events),
    grid AS (
        SELECT t.event_type, unnest(generate_series(sp.lo, sp.hi)) AS h
        FROM t, sp
    )
    SELECT g.event_type,
           CAST(g.h AS BIGINT) AS hour_epoch,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM grid g
    LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    ORDER BY 1, 2
"""

# Interval-union coverage per day: same sessionization + day split as
# session_concurrency; covered = sum of sweep segments with run > 0
# (half-open [cst, cen+1) boundaries — single-event sessions cover 1 µs).
ORACLE_SQL["session_coverage"] = """
    WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
    o AS (
        SELECT user_id, t,
               lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt
        FROM e
    ),
    m AS (
        SELECT user_id, t,
               CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1
                    ELSE 0 END AS brk
        FROM o
    ),
    s AS (
        SELECT user_id, t,
               sum(brk) OVER (PARTITION BY user_id ORDER BY t
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM m
    ),
    sess AS (
        SELECT user_id, sid, min(t) AS st, max(t) AS en
        FROM s GROUP BY 1, 2
    ),
    days AS (
        SELECT st, en,
               unnest(generate_series(st // 86400000000,
                                      en // 86400000000)) AS day
        FROM sess
    ),
    clip AS (
        SELECT day,
               greatest(st, day * 86400000000) AS cst,
               least(en, day * 86400000000 + 86399999999) AS cen
        FROM days
    ),
    b AS (
        SELECT day, cst AS t, 1 AS d FROM clip
        UNION ALL
        SELECT day, cen + 1, -1 FROM clip
    ),
    r AS (
        SELECT day, t,
               sum(d) OVER (PARTITION BY day ORDER BY t, d DESC
                            ROWS UNBOUNDED PRECEDING) AS run,
               lead(t) OVER (PARTITION BY day ORDER BY t, d DESC) AS nt
        FROM b
    ),
    cov AS (
        SELECT day,
               sum(CASE WHEN run > 0 AND nt IS NOT NULL THEN nt - t
                        ELSE 0 END) AS covered
        FROM r GROUP BY 1
    )
    SELECT CAST(c.day AS BIGINT) AS day_epoch,
           CAST(ns.n AS BIGINT) AS n_sessions,
           CAST(c.covered AS BIGINT) AS covered_us,
           CAST(c.covered * 1000000 // 86400000000 AS BIGINT)
               AS coverage_ppm
    FROM cov c
    JOIN (SELECT day, count(*) AS n FROM clip GROUP BY 1) ns
      ON ns.day = c.day
    ORDER BY 1
"""

# Lang similarity: integer cos² in ppm between per-lang token-count
# vectors over the top-32 vocabulary (HUGEINT absorbs the squared
# numerator).
ORACLE_SQL["lang_similarity"] = """
    WITH toks AS (
        SELECT lang,
               unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS tok
        FROM documents
    ), tc AS (
        SELECT tok, count(*) AS n FROM toks WHERE tok != '' GROUP BY 1
    ), top AS (
        SELECT tok FROM tc ORDER BY n DESC, tok LIMIT 32
    ), lv AS (
        SELECT lang, tok, CAST(count(*) AS HUGEINT) AS n
        FROM toks WHERE tok IN (SELECT tok FROM top) GROUP BY 1, 2
    ), nr AS (
        SELECT lang, sum(n * n) AS n2 FROM lv GROUP BY 1
    ), dd AS (
        SELECT a.lang AS la, b.lang AS lb, sum(a.n * b.n) AS d
        FROM lv a JOIN lv b ON a.tok = b.tok AND a.lang < b.lang
        GROUP BY 1, 2
    )
    SELECT dd.la AS lang_a, dd.lb AS lang_b,
           CAST(dd.d AS BIGINT) AS dot,
           CAST(dd.d * dd.d * 1000000
                // greatest(na.n2 * nb.n2, 1) AS BIGINT) AS cos2_ppm
    FROM dd
    JOIN nr na ON na.lang = dd.la
    JOIN nr nb ON nb.lang = dd.lb
    ORDER BY 1, 2
"""

# Hourly anomalies: division-free integer 3-sigma over the dense grid;
# worst offender = max count, tie earliest hour.
ORACLE_SQL["hourly_anomalies"] = """
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
    ),
    c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
    sp AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    t AS (SELECT DISTINCT event_type FROM events),
    grid AS (
        SELECT t.event_type, unnest(generate_series(sp.lo, sp.hi)) AS h
        FROM t, sp
    ),
    d AS (
        SELECT g.event_type, g.h,
               CAST(COALESCE(c.n, 0) AS HUGEINT) AS x
        FROM grid g
        LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    ),
    mo AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS s1, sum(x * x) AS s2
        FROM d GROUP BY 1
    ),
    fl AS (
        SELECT d.event_type, d.h, d.x,
               CASE WHEN (d.x * mo.n - mo.s1) * (d.x * mo.n - mo.s1)
                         > 9 * (mo.n * mo.s2 - mo.s1 * mo.s1)
                    THEN 1 ELSE 0 END AS anom,
               row_number() OVER (PARTITION BY d.event_type
                                  ORDER BY d.x DESC, d.h) AS rk
        FROM d JOIN mo USING (event_type)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(anom) AS BIGINT) AS n_anomalies,
           CAST(min(CASE WHEN rk = 1 THEN h END) AS BIGINT)
               AS max_hour_epoch,
           CAST(min(CASE WHEN rk = 1 THEN x END) AS BIGINT) AS max_n
    FROM fl GROUP BY 1 ORDER BY 1
"""

# Vocabulary-tail stats: hapax fraction + type-token ratio per lang.
ORACLE_SQL["hapax_stats"] = """
    WITH toks AS (
        SELECT lang,
               unnest(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS tok
        FROM documents
    ),
    lv AS (
        SELECT lang, tok, CAST(count(*) AS HUGEINT) AS n
        FROM toks WHERE tok != '' GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
                // greatest(count(*), 1) AS BIGINT) AS hapax_ppm,
           CAST(count(*) * 1000000 // greatest(sum(n), 1) AS BIGINT)
               AS ttr_ppm
    FROM lv GROUP BY 1 ORDER BY 1
"""

# Mixed-language docs: the proven langid stopword-argmax rule applied
# per LINE, distinct predicted langs per doc (CJK branch vacuous on
# this ASCII corpus, as in langid_pred's twin).
ORACLE_SQL["mixed_lang_docs"] = """
    WITH lines AS (
        SELECT doc_id,
               unnest(string_split(COALESCE(text, ''), chr(10))) AS ln
        FROM documents
    ), w AS (
        SELECT doc_id,
               list_transform(
                   regexp_extract_all(substr(ln, 1, 4000), '[a-zA-Z]+'),
                   x -> lower(x)) AS words
        FROM lines
    ), h AS (
        SELECT doc_id,
               len(list_filter(words, x -> list_contains(
                   ['der','die','das','und','ist','nicht','ein','eine','mit','von','zu'], x))) AS h_de,
               len(list_filter(words, x -> list_contains(
                   ['the','and','of','to','a','in','is','that','for','it','with','was'], x))) AS h_en,
               len(list_filter(words, x -> list_contains(
                   ['el','la','los','las','es','una','del','que','por','para','como'], x))) AS h_es,
               len(list_filter(words, x -> list_contains(
                   ['le','la','les','et','est','une','des','dans','que','pour','pas'], x))) AS h_fr
        FROM w
    ), p AS (
        SELECT doc_id,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'unknown'
                    WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
                    WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                    WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                    ELSE 'fr' END AS plang
        FROM h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN plang <> 'unknown' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pred_lines,
           CAST(count(DISTINCT CASE WHEN plang <> 'unknown' THEN plang END)
                AS BIGINT) AS n_langs,
           count(DISTINCT CASE WHEN plang <> 'unknown' THEN plang END) >= 2
               AS is_mixed
    FROM p GROUP BY 1 ORDER BY 1
"""

# Duplicate-cap sampling: keep the 2 smallest doc_ids per exact
# content-sha256 group (C4/Gopher "at most m copies").
ORACLE_SQL["dup_cap_sample"] = """
    WITH g AS (
        SELECT doc_id,
               row_number() OVER (
                   PARTITION BY sha256(COALESCE(text, ''))
                   ORDER BY doc_id) AS copy_idx,
               count(*) OVER (
                   PARTITION BY sha256(COALESCE(text, ''))) AS group_n
        FROM documents
    )
    SELECT doc_id,
           CAST(copy_idx AS BIGINT) AS copy_idx,
           CAST(group_n AS BIGINT) AS group_n
    FROM g WHERE copy_idx <= 2 ORDER BY doc_id
"""

# CCNet-style per-line corpus dedup: a nonempty line occurrence is
# removed unless this doc is the line's min-doc_id owner.
ORACLE_SQL["line_dedup_filter"] = """
    WITH lines AS (
        SELECT doc_id, ln, length(ln) AS clen
        FROM (
            SELECT doc_id,
                   unnest(string_split(COALESCE(text, ''), chr(10))) AS ln
            FROM documents
        ) WHERE ln != ''
    ), owner AS (
        SELECT ln, min(doc_id) AS own FROM lines GROUP BY 1
    ), per AS (
        SELECT l.doc_id,
               count(*) AS n_lines,
               sum(CASE WHEN o.own = l.doc_id THEN 1 ELSE 0 END) AS n_kept,
               sum(CASE WHEN o.own <> l.doc_id THEN l.clen ELSE 0 END)
                   AS removed_chars
        FROM lines l JOIN owner o ON l.ln = o.ln GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.n_lines, 0) AS BIGINT) AS n_lines,
           CAST(COALESCE(p.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(p.removed_chars, 0) AS BIGINT) AS removed_chars
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    ORDER BY 1
"""

# Splink-style TF-adjusted match evidence over rare shared token
# 3-grams (document frequency 2..4): weight = sum(1e6 // df),
# integer-exact. Phrases, not tokens: the corpus vocabulary is a
# closed 31-word set, so single tokens carry no rarity signal.
ORACLE_SQL["tf_match_weights"] = """
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(COALESCE(text, '')), '\\s+') AS a
        FROM documents
    ), g AS (
        SELECT DISTINCT doc_id,
               lower(list_aggregate(a[i:i+2], 'string_agg', ' ')) AS gram
        FROM (
            SELECT doc_id, a,
                   unnest(range(1, greatest(len(a) - 1, 1))) AS i
            FROM t
        )
    ), df AS (
        SELECT gram, count(*) AS ndocs
        FROM g GROUP BY 1
        HAVING count(*) BETWEEN 2 AND 4
    )
    SELECT a.doc_id AS doc_a,
           b.doc_id AS doc_b,
           CAST(sum(1000000 // d.ndocs) AS BIGINT) AS tf_weight,
           CAST(count(*) AS BIGINT) AS n_shared_rare
    FROM df d
    JOIN g a ON a.gram = d.gram
    JOIN g b ON b.gram = d.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2 ORDER BY 1, 2
"""

# Per-source language Gini impurity in integer ppm (mixture-curation
# diversity diagnostic).
ORACLE_SQL["source_lang_gini"] = """
    WITH c AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ), s AS (
        SELECT source,
               sum(n) AS nd, count(*) AS nl, sum(n * n) AS ss
        FROM c GROUP BY 1
    )
    SELECT source,
           CAST(nd AS BIGINT) AS n_docs,
           CAST(nl AS BIGINT) AS n_langs,
           CAST(1000000 - (1000000 * ss) // (nd * nd) AS BIGINT)
               AS gini_ppm
    FROM s ORDER BY 1
"""

# k-anonymity class-size histogram over the quasi-identifier
# (lang, source, n_chars // 256); at_risk = class_size < 5.
ORACLE_SQL["k_anonymity_audit"] = """
    WITH cls AS (
        SELECT lang, source, n_chars // 256 AS sz,
               CAST(count(*) AS BIGINT) AS class_size
        FROM documents GROUP BY 1, 2, 3
    )
    SELECT class_size,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(class_size * count(*) AS BIGINT) AS n_docs,
           class_size < 5 AS at_risk
    FROM cls GROUP BY 1 ORDER BY 1
"""

# Benford first-significant-digit shares of positive event value-cents.
ORACLE_SQL["benford_digits"] = """
    WITH c AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events
    ), d AS (
        SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
               AS digit
        FROM c WHERE cents > 0
    ), n AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n_events
        FROM d GROUP BY 1
    )
    SELECT digit, n_events,
           CAST(n_events * 1000000 //
                greatest((SELECT sum(n_events) FROM n), 1) AS BIGINT)
               AS share_ppm
    FROM n ORDER BY 1
"""

# CUBE over (lang, source): all four grouping sets, '*' marks a
# rolled-up axis (same sentinel convention as rollup_counts).
ORACLE_SQL["cube_counts"] = """
    SELECT CASE WHEN GROUPING(lang) = 1 THEN '*' ELSE lang END AS lang,
           CASE WHEN GROUPING(source) = 1 THEN '*' ELSE source END
               AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY CUBE (lang, source)
"""

# Held-out OOV rate: train = doc_id % 10 <> 0; per-lang distinct-token
# set algebra with integer-ppm OOV share. Token classes = the BPE
# pre-tokenizer runs (same pattern as vocab_stats).
ORACLE_SQL["oov_rate"] = """
    WITH tok AS (
        SELECT lang,
               unnest(regexp_extract_all(
                   COALESCE(text, ''),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS tok,
               doc_id % 10 <> 0 AS tr
        FROM documents
    ), v AS (
        SELECT lang, tok,
               CAST(max(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT)
                   AS in_train,
               CAST(max(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT)
                   AS in_holdout
        FROM tok GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(in_train) AS BIGINT) AS n_train_vocab,
           CAST(sum(in_holdout) AS BIGINT) AS n_holdout_vocab,
           CAST(sum(in_train * in_holdout) AS BIGINT) AS n_common,
           CAST(sum(CASE WHEN in_train = 0 AND in_holdout = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout_only,
           CAST(sum(CASE WHEN in_train = 0 AND in_holdout = 1
                         THEN 1 ELSE 0 END) * 1000000
                // greatest(sum(in_holdout), 1) AS BIGINT) AS oov_ppm
    FROM v GROUP BY 1 ORDER BY 1
"""

# Median / MAD length outliers per lang — the pinned integer rank rule
# (50*n+99)//100 on the compacted histogram, deviation histogram
# derived from the value histogram, outlier iff |v - med| > 3*MAD.
ORACLE_SQL["mad_outliers"] = """
    WITH h AS (
        SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS pn
        FROM documents GROUP BY 1, 2
    ), t AS (
        SELECT lang, CAST(sum(pn) AS BIGINT) AS total FROM h GROUP BY 1
    ), c AS (
        SELECT h.lang, v, pn,
               sum(pn) OVER (PARTITION BY h.lang ORDER BY v) AS cum,
               t.total
        FROM h JOIN t ON h.lang = t.lang
    ), med AS (
        SELECT lang, CAST(min(v) AS BIGINT) AS median
        FROM c WHERE cum >= (50 * total + 99) // 100 GROUP BY 1
    ), d AS (
        SELECT h.lang, abs(v - m.median) AS dev,
               CAST(sum(pn) AS BIGINT) AS pn
        FROM h JOIN med m ON h.lang = m.lang GROUP BY 1, 2
    ), cd AS (
        SELECT d.lang, dev, pn,
               sum(pn) OVER (PARTITION BY d.lang ORDER BY dev) AS cum,
               t.total
        FROM d JOIN t ON d.lang = t.lang
    ), mad AS (
        SELECT lang, CAST(min(dev) AS BIGINT) AS mad
        FROM cd WHERE cum >= (50 * total + 99) // 100 GROUP BY 1
    )
    SELECT h.lang,
           CAST(max(t.total) AS BIGINT) AS n_docs,
           CAST(max(m.median) AS BIGINT) AS median,
           CAST(max(a.mad) AS BIGINT) AS mad,
           CAST(COALESCE(sum(CASE WHEN abs(v - m.median) > 3 * a.mad
                                  THEN pn END), 0) AS BIGINT) AS n_outliers
    FROM h
    JOIN t ON h.lang = t.lang
    JOIN med m ON h.lang = m.lang
    JOIN mad a ON h.lang = a.lang
    GROUP BY 1 ORDER BY 1
"""

# Dense daily trend grid with LAG delta (first day's delta = its count).
ORACLE_SQL["trending_types"] = """
    WITH e AS (
        SELECT event_type, epoch_us(ts) // 86400000000 AS d FROM events
    ),
    c AS (SELECT event_type, d, count(*) AS n FROM e GROUP BY 1, 2),
    sp AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
    t AS (SELECT DISTINCT event_type FROM events),
    grid AS (
        SELECT t.event_type, unnest(generate_series(sp.lo, sp.hi)) AS d
        FROM t, sp
    ),
    f AS (
        SELECT g.event_type,
               CAST(g.d AS BIGINT) AS day_epoch,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
        FROM grid g
        LEFT JOIN c ON c.event_type = g.event_type AND c.d = g.d
    )
    SELECT event_type, day_epoch, n_events,
           CAST(n_events - COALESCE(lag(n_events) OVER (
               PARTITION BY event_type ORDER BY day_epoch), 0)
               AS BIGINT) AS delta
    FROM f ORDER BY 1, 2
"""

# Market-basket part pairs: distinct (order, part) self-join, count per
# unordered pair, top-20 under the pinned total order
# (n_orders DESC, pk_a, pk_b) — pairs are unique so the cut is
# deterministic under count ties.
ORACLE_SQL["copurchase_pairs"] = """
    WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pr AS (
        SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b
        FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    c AS (
        SELECT pk_a, pk_b, CAST(count(*) AS BIGINT) AS n_orders
        FROM pr GROUP BY 1, 2
    )
    SELECT CAST(pk_a AS BIGINT) AS pk_a, CAST(pk_b AS BIGINT) AS pk_b,
           n_orders
    FROM c ORDER BY n_orders DESC, pk_a, pk_b LIMIT 20
"""

# l-diversity over QI (source, n_chars // 256), sensitive = lang:
# histogram of classes by distinct-lang count; at_risk = homogeneous.
ORACLE_SQL["l_diversity_audit"] = """
    WITH cls AS (
        SELECT source, n_chars // 256 AS sz,
               CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct,
               CAST(count(*) AS BIGINT) AS nd
        FROM documents GROUP BY 1, 2
    )
    SELECT l_distinct,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(nd) AS BIGINT) AS n_docs,
           l_distinct < 2 AS at_risk
    FROM cls GROUP BY 1 ORDER BY 1
"""

# Cumulative distinct users per day: first-seen-day histogram + window
# sum over the dense [min, max] event-day grid.
ORACLE_SQL["cumulative_users"] = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS d FROM events
    ),
    u AS (SELECT user_id, min(d) AS fd FROM e GROUP BY 1),
    sp AS (SELECT min(d) AS lo, max(d) AS hi FROM e),
    grid AS (SELECT unnest(generate_series(lo, hi)) AS d FROM sp),
    nu AS (SELECT fd AS d, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1)
    SELECT CAST(g.d AS BIGINT) AS day_epoch,
           CAST(COALESCE(nu.n, 0) AS BIGINT) AS n_new_users,
           CAST(sum(COALESCE(nu.n, 0)) OVER (ORDER BY g.d) AS BIGINT)
               AS n_cum_users
    FROM grid g LEFT JOIN nu ON nu.d = g.d ORDER BY 1
"""

# Weekly churn: distinct (user, week) self-join on w+1; the last week
# churns by definition. Weeks = epoch-µs // 7 days (no ISO semantics).
ORACLE_SQL["weekly_churn"] = """
    WITH uw AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
        FROM events
    )
    SELECT CAST(a.w AS BIGINT) AS week_epoch,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned,
           CAST(sum(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                * 1000000 // greatest(count(*), 1) AS BIGINT)
               AS churn_ppm
    FROM uw a
    LEFT JOIN uw b ON b.user_id = a.user_id AND b.w = a.w + 1
    GROUP BY 1 ORDER BY 1
"""

# FK fanout histogram (orders per customer incl. the zero bucket).
ORACLE_SQL["fanout_histogram"] = """
    WITH oc AS (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    j AS (
        SELECT c.c_custkey, CAST(COALESCE(oc.n, 0) AS BIGINT) AS n
        FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
    )
    SELECT n AS n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM j GROUP BY 1 ORDER BY 1
"""

# Tiered match waterfall: distinct-key counts per deterministic
# normalization tier (raw / lower / lower+whitespace-collapsed).
ORACLE_SQL["match_waterfall"] = """
    WITH t1 AS (
        SELECT CAST(count(*) AS BIGINT) AS nd,
               CAST(count(DISTINCT COALESCE(text, '')) AS BIGINT) AS ng
        FROM documents
    ), t2 AS (
        SELECT CAST(count(*) AS BIGINT) AS nd,
               CAST(count(DISTINCT lower(COALESCE(text, ''))) AS BIGINT)
                   AS ng
        FROM documents
    ), t3 AS (
        SELECT CAST(count(*) AS BIGINT) AS nd,
               CAST(count(DISTINCT trim(regexp_replace(
                   lower(COALESCE(text, '')), '[ \\t\\n\\f\\r]+', ' ',
                   'g'))) AS BIGINT) AS ng
        FROM documents
    )
    SELECT '1_raw' AS tier, ng AS n_groups, nd AS n_docs,
           nd - ng AS n_dup_docs FROM t1
    UNION ALL
    SELECT '2_lower', ng, nd, nd - ng FROM t2
    UNION ALL
    SELECT '3_ws_norm', ng, nd, nd - ng FROM t3
    ORDER BY 1
"""

# CSV round-trip proof: the oracle reads the ORIGINAL parquet — the
# engine reads its own CSV copy; hash equality of the per-lang strh60
# text fold (60-bit, summed mod 2^61) proves the quoting layer lossless.
ORACLE_SQL["csv_read_counts"] = _STRH_PRELUDE + """
    WITH f AS (
        SELECT lang, n_chars,
               CAST(strh60(COALESCE(text, '')) AS HUGEINT) AS hv
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars,
           CAST(sum(hv) % 2305843009213693952 AS BIGINT) AS text_fold
    FROM f GROUP BY 1 ORDER BY 1
"""

# Bag algebra between train/holdout token multisets: EXCEPT ALL =
# sum(greatest(ctr - cho, 0)), INTERSECT ALL = sum(least(ctr, cho)).
ORACLE_SQL["except_all_tokens"] = """
    WITH tok AS (
        SELECT lang,
               unnest(regexp_extract_all(
                   COALESCE(text, ''),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS tok,
               doc_id % 10 <> 0 AS tr
        FROM documents
    ), c AS (
        SELECT lang, tok,
               CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS ctr,
               CAST(sum(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT) AS cho
        FROM tok GROUP BY 1, 2
    )
    SELECT lang,
           CAST(sum(ctr) AS BIGINT) AS n_train_tokens,
           CAST(sum(cho) AS BIGINT) AS n_holdout_tokens,
           CAST(sum(greatest(ctr - cho, 0)) AS BIGINT) AS except_all,
           CAST(sum(least(ctr, cho)) AS BIGINT) AS intersect_all
    FROM c GROUP BY 1 ORDER BY 1
"""

# PERCENT_RANK per lang over n_chars as integer ppm: rank()-1 counts
# strictly-smaller values (ties take min rank), matching the engine's
# cumulative-less searchsorted rule.
ORACLE_SQL["percentile_rank_docs"] = """
    SELECT doc_id, lang,
           CAST((rank() OVER (PARTITION BY lang ORDER BY n_chars) - 1)
                * 1000000
                // greatest(count(*) OVER (PARTITION BY lang) - 1, 1)
                AS BIGINT) AS pct_rank_ppm
    FROM documents
"""

# Leave-one-out target encoding of source by mean n_chars (milli);
# singleton categories drop on both sides.
ORACLE_SQL["loo_target_encoding"] = """
    WITH w AS (
        SELECT doc_id, source, n_chars,
               sum(n_chars) OVER (PARTITION BY source) AS s,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CAST((s - n_chars) * 1000 // (n - 1) AS BIGINT)
               AS loo_mean_milli
    FROM w WHERE n >= 2
"""

# Cosine histogram over all pairs of the 64 smallest-vec_id embeddings
# (0.1-wide buckets, epsilon-before-floor boundary guard).
ORACLE_SQL["cos_pair_histogram"] = """
    WITH s AS (
        SELECT vec_id, embedding,
               row_number() OVER (ORDER BY vec_id) AS rk
        FROM embeddings
    ), sample AS (
        SELECT vec_id, embedding FROM s WHERE rk <= 64
    ), p AS (
        SELECT CAST(floor(list_cosine_similarity(a.embedding, b.embedding)
                          * 10 + 0.0000001) AS BIGINT) AS bucket
        FROM sample a JOIN sample b ON a.vec_id < b.vec_id
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1 ORDER BY 1
"""

# MinHash estimate-vs-exact audit over the band-collision pairs:
# signatures (s0..s7) AND distinct shingle sets recomputed in SQL;
# pairs with zero shared shingles kept via LEFT JOIN (band-fold
# collisions must not drop rows the engine scores).
_MJE_TAIL = """, prs AS (
    SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
           greatest(a.doc_id, b.doc_id) AS id_b
    FROM keys a JOIN keys b
      ON a.band = b.band AND a.k = b.k AND a.doc_id <> b.doc_id
), sh AS (
    SELECT DISTINCT doc_id, hv FROM h
), sz AS (
    SELECT doc_id, CAST(count(*) AS HUGEINT) AS n FROM sh GROUP BY 1
), inter AS (
    SELECT p.id_a, p.id_b, CAST(count(*) AS HUGEINT) AS ni
    FROM prs p
    JOIN sh a ON a.doc_id = p.id_a
    JOIN sh b ON b.doc_id = p.id_b AND b.hv = a.hv
    GROUP BY 1, 2
), scored AS (
    SELECT
      CAST((CASE WHEN sa.s0 = sb.s0 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s1 = sb.s1 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s2 = sb.s2 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s3 = sb.s3 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s4 = sb.s4 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s5 = sb.s5 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s6 = sb.s6 THEN 1 ELSE 0 END)
         + (CASE WHEN sa.s7 = sb.s7 THEN 1 ELSE 0 END) AS BIGINT)
          AS est_matches,
      CAST(CASE WHEN za.n + zb.n - COALESCE(i.ni, 0) > 0
                THEN COALESCE(i.ni, 0) * 1000000
                     // (za.n + zb.n - COALESCE(i.ni, 0))
                ELSE 0 END AS BIGINT) AS exact_ppm
    FROM prs p
    JOIN sig sa ON sa.doc_id = p.id_a
    JOIN sig sb ON sb.doc_id = p.id_b
    JOIN sz za ON za.doc_id = p.id_a
    JOIN sz zb ON zb.doc_id = p.id_b
    LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
)
SELECT est_matches,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(exact_ppm) // count(*) AS BIGINT) AS mean_exact_ppm,
       CAST(max(abs(est_matches * 1000000 // 8 - exact_ppm)) AS BIGINT)
           AS max_err_ppm
FROM scored GROUP BY 1 ORDER BY 1
"""

ORACLE_SQL["minhash_jaccard_error"] = _minhash_keys_sql().rstrip() + _MJE_TAIL

# Integer EWMA recursion over the dense hourly grid (alpha = 1/8,
# s_0 = 1000*n_0, s_t = (1000*n_t + 7*s_{t-1}) // 8).
ORACLE_SQL["ewma_hourly"] = """
    WITH RECURSIVE e AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
    ),
    c AS (SELECT event_type, h, count(*) AS n FROM e GROUP BY 1, 2),
    sp AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    t AS (SELECT DISTINCT event_type FROM events),
    grid AS (
        SELECT t.event_type, unnest(generate_series(sp.lo, sp.hi)) AS h
        FROM t, sp
    ),
    f AS (
        SELECT g.event_type,
               CAST(g.h AS BIGINT) AS h,
               CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
               row_number() OVER (
                   PARTITION BY g.event_type ORDER BY g.h) AS rn
        FROM grid g
        LEFT JOIN c ON c.event_type = g.event_type AND c.h = g.h
    ),
    r AS (
        SELECT event_type, h, rn, n, CAST(n * 1000 AS BIGINT) AS ewma
        FROM f WHERE rn = 1
        UNION ALL
        SELECT f.event_type, f.h, f.rn, f.n,
               CAST((f.n * 1000 + 7 * r.ewma) // 8 AS BIGINT)
        FROM r JOIN f ON f.event_type = r.event_type AND f.rn = r.rn + 1
    )
    SELECT event_type, h AS hour_epoch, n AS n_events,
           ewma AS ewma_milli
    FROM r
"""

# Welch z^2 > 4 between every source pair, division-free in HUGEINT:
# (sxa*nb - sxb*na)^2 (na-1)(nb-1)  >  4(qa nb^2 (nb-1) + qb na^2 (na-1)),
# q_i = n_i*sxx_i - sx_i^2. Means in integer milli.
ORACLE_SQL["source_ab_tests"] = """
    WITH m AS (
        SELECT source, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(n_chars AS HUGEINT)) AS sx,
               sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
                   AS sxx
        FROM documents GROUP BY 1 HAVING count(*) >= 2
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(a.sx * 1000 // a.n AS BIGINT) AS mean_a_milli,
           CAST(b.sx * 1000 // b.n AS BIGINT) AS mean_b_milli,
           (a.sx * b.n - b.sx * a.n) * (a.sx * b.n - b.sx * a.n)
             * (a.n - 1) * (b.n - 1)
           > 4 * ((a.n * a.sxx - a.sx * a.sx) * b.n * b.n * (b.n - 1)
                + (b.n * b.sxx - b.sx * b.sx) * a.n * a.n * (a.n - 1))
               AS significant
    FROM m a JOIN m b ON a.source < b.source
    ORDER BY 1, 2
"""

# CV fold stratification audit: integer chi-square of each hash fold's
# lang distribution against the global one (HUGEINT, per-cell floors
# summed identically on both sides; zero cells included via the grid).
ORACLE_SQL["cv_fold_balance"] = """
    WITH c AS (
        SELECT doc_id % 5 AS fold, lang, CAST(count(*) AS HUGEINT) AS o
        FROM documents GROUP BY 1, 2
    ),
    nf AS (SELECT fold, sum(o) AS n FROM c GROUP BY 1),
    nl AS (SELECT lang, sum(o) AS n FROM c GROUP BY 1),
    tt AS (SELECT sum(o) AS t FROM c),
    grid AS (
        SELECT nf.fold, nl.lang, nf.n AS nf, nl.n AS nl FROM nf, nl
    ),
    j AS (
        SELECT g.fold, g.lang, g.nf, g.nl, COALESCE(c.o, 0) AS o
        FROM grid g
        LEFT JOIN c ON c.fold = g.fold AND c.lang = g.lang
    )
    SELECT CAST(j.fold AS BIGINT) AS fold,
           CAST(max(j.nf) AS BIGINT) AS n_docs,
           CAST(sum((j.o * tt.t - j.nf * j.nl)
                    * (j.o * tt.t - j.nf * j.nl)
                    // (j.nf * j.nl * tt.t)) AS BIGINT) AS chi2_stat
    FROM j, tt GROUP BY 1 ORDER BY 1
"""

# Hybrid RRF for query id 0: dense ranking on basis-point-quantized
# cosine (ties cannot reorder between engines), lexical ranking on
# shared distinct 8-gram shingle hashes (the macro's h CTE), top-20
# each, rrf = sum(1e6 // (60 + rank)), 0 marks absence, top-10 cut.
_RRF_TAIL = """, sh AS (
    SELECT DISTINCT doc_id, hv FROM h
), q AS (SELECT hv FROM sh WHERE doc_id = 0),
lexc AS (
    SELECT s.doc_id, CAST(count(*) AS BIGINT) AS shared
    FROM sh s JOIN q ON q.hv = s.hv
    WHERE s.doc_id <> 0 GROUP BY 1
),
lexr AS (
    SELECT doc_id, row_number() OVER (ORDER BY shared DESC, doc_id) AS r
    FROM lexc
),
lex20 AS (SELECT doc_id, r FROM lexr WHERE r <= 20),
qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
dbp AS (
    SELECT e.vec_id,
           CAST(floor(list_cosine_similarity(e.embedding, q.embedding)
                      * 10000 + 0.0000001) AS BIGINT) AS bp
    FROM embeddings e, qv q WHERE e.vec_id <> 0
),
dr AS (
    SELECT vec_id, row_number() OVER (ORDER BY bp DESC, vec_id) AS r
    FROM dbp
),
den20 AS (SELECT vec_id, r FROM dr WHERE r <= 20),
ids AS (
    SELECT doc_id AS id FROM lex20
    UNION
    SELECT vec_id FROM den20
),
fuse AS (
    SELECT i.id,
           CAST(COALESCE(d.r, 0) AS BIGINT) AS rank_dense,
           CAST(COALESCE(l.r, 0) AS BIGINT) AS rank_lexical,
           CAST(CASE WHEN d.r IS NULL THEN 0
                     ELSE 1000000 // (60 + d.r) END
              + CASE WHEN l.r IS NULL THEN 0
                     ELSE 1000000 // (60 + l.r) END AS BIGINT) AS rrf_micro
    FROM ids i
    LEFT JOIN den20 d ON d.vec_id = i.id
    LEFT JOIN lex20 l ON l.doc_id = i.id
)
SELECT id, rank_dense, rank_lexical, rrf_micro FROM fuse
ORDER BY rrf_micro DESC, id LIMIT 10
"""

ORACLE_SQL["rrf_fusion"] = _minhash_keys_sql().rstrip() + _RRF_TAIL

# Heaps-law vocabulary growth: min doc_id per token, decile histogram
# of first occurrences, prefix sum.
ORACLE_SQL["vocab_growth"] = """
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(
                   COALESCE(text, ''),
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS tok
        FROM documents
    ),
    fs AS (SELECT tok, min(doc_id) AS fd FROM tok GROUP BY 1),
    tt AS (SELECT count(*) AS n FROM documents),
    b AS (
        SELECT fd * 10 // tt.n AS decile,
               CAST(count(*) AS BIGINT) AS nn
        FROM fs, tt GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           nn AS n_new_tokens,
           CAST(sum(nn) OVER (ORDER BY decile) AS BIGINT) AS n_cum_tokens
    FROM b ORDER BY 1
"""


# ---- flagship MinHash-LSH dedup pipeline (VERDICT r3 item 2) ----
def _build_flagship_lsh_sql(
    tail: str | None = None,
    src: str | None = None,
    cand_extra: str | None = None,
) -> str:
    """Full-fidelity DuckDB twin of the FLAGSHIP dedup pipeline
    (``pipelines/dedup.py``) over documents-as-corpus — fingerprint →
    exact dedup → LSH blocking → sketch scoring → content rescore band →
    transitive closure → cluster-size histogram.  Recomputes, per doc:

    - the fingerprint normalizer (same regex chain as the green
      ``minhash_band_keys`` oracle),
    - OPH MinHash with rotation densification (Li NIPS'12 /
      Shrivastava ICML'14; ``functions/hashing.py:oph_minhash``) for all
      THREE sketches: 12-gram char (128 lanes, seed 42), 4-gram fine
      (128 lanes, seed 55), token (64 lanes, seed 49) — bin mins via
      ``shr(h, shift)`` groupby, empty lanes borrow the cyclically-next
      filled lane remixed by the borrow distance (window-function
      next-filled + self-join),
    - the 32×4 band fold (``lsh_band_keys``) over densified lanes,
    - the scorer (``stages/scoring.py:_score_arrays``) on 16-bit
      truncated lanes (64 char / 32 token / 64 fine — ``_reduce_feats``):
      gate, blend, JW-in-decision-window, content estimate, exact
      override — float literals are repr() of the engine's float64
      values (0.5 − 0.08 ≠ 0.42 in binary64),
    - the content-rescore band (``stages/rescore.py``): exact distinct
      12-/4-gram Jaccard via substring sets,
    - min-label closure over match ∪ duplicate edges (recursive CTE).

    Domain assumptions (all verified to hold at the oracle scales
    sf0.001/sf0.01 by tools/probe + tests; each names its engine twin):
    1. No hot-key salting and no per-block pair-cap truncation
       (``probe_hot_keys`` = {} and band multiplicity ≤ 91 — caps are
       record_id(blake2b)-ordered, not SQL-recomputable).
    2. Representative election is recomputed EXACTLY: the engine's r4
       rule is min (md5(repo || 0x1f || path), record order) per sha —
       a pure function of the natural key, chosen precisely so this
       oracle can mirror it (sf0.1 has same-sha groups whose members
       differ in lang, which feeds the P4 rule; blake2b record-id
       order was not SQL-expressible).  The record_id tie-break only
       fires for identical (repo, path) across commits — impossible in
       the documents corpus, whose paths embed doc_id.
    3. ``jaro_winkler_similarity`` (DuckDB, boost-threshold 0.7) equals
       the engine's unconditional-boost JW (``functions/similarity.py``)
       because candidate paths share the ≥4-char "docs" prefix, so
       jaro > 0.7 always — verified bit-exact over the path domain.
    4. Exact substring-set Jaccard stands in for the engine's
       hash-set Jaccard (64-bit splitmix shingle hashes,
       collision-free at corpus scale — same documented assumption as
       ``ngram_jaccard_stats``).

    ``tail``: optional replacement for the final histogram SELECT —
    must consume the ``comp (doc_id, cluster_id)`` CTE.

    ``src``: optional replacement for the corpus source CTE — a SELECT
    yielding ``(doc_id, lang, path, repo_key, text)`` (extra columns
    allowed; ``text`` must be non-null).  Default: the documents-as-
    corpus synthesis.  Lets the same twin run over a DIFFERENT corpus
    parquet (e.g. the dup-dense fixture corpus for ``pr_curve``).

    ``cand_extra``: optional ``UNION ALL SELECT da, db …`` fragment
    appended inside the candidate CTE — used to model the M18 exact
    (lang, basename) blocking key, which contributes nothing on the
    documents corpus (basenames unique) but matters on corpora with
    shared basenames.  Must emit ``doc_id``-pairs over the rep set.
    """
    from address_parser_ray.functions.hashing import _mod_inverse_u64

    M = 1 << 64
    GOLDEN = 0x9E3779B97F4A7C15
    POLY = 1099511628211
    PINV = _mod_inverse_u64(POLY)
    OFF_MH = (42 * GOLDEN) % M
    OFF_TMH = (49 * GOLDEN) % M
    OFF_FMH = (55 * GOLDEN) % M
    POW12 = [pow(POLY, 11 - t, M) for t in range(12)]
    POW4 = [pow(POLY, 3 - t, M) for t in range(4)]
    SENT = M - 1
    # score constants — repr() of the EXACT Python float64 values the
    # engine compares against (0.5 - 0.08 is NOT 0.42 in float64)
    LO = repr(0.5 - 0.08)
    HI = repr(0.5 + 0.08)

    def terms(powers, k):
        return " +\n        ".join(
            f"ascii(substr(t, CAST(i AS INT) + {t}, 1)) * CAST({powers[t]} AS HUGEINT)"
            for t in range(k)
        )

    def sketch_ctes(tag, hsrc, nlanes, shift):
        """binmin → dense lanes (with rotation densification + empty-doc
        sentinel) for one sketch family. ``hsrc`` must yield (doc_id, h)."""
        return f"""
, bm_{tag} AS MATERIALIZED (
  SELECT doc_id, CAST(shr(h, {shift}) AS BIGINT) AS lane, min(h) AS v
  FROM {hsrc} GROUP BY 1, 2
), lx_{tag} AS (
  SELECT n.doc_id, l.lane, b.v
  FROM (SELECT DISTINCT doc_id FROM bm_{tag}) n
  CROSS JOIN (SELECT unnest(range(0, {nlanes})) AS lane) l
  LEFT JOIN bm_{tag} b ON b.doc_id = n.doc_id AND b.lane = l.lane
), nf_{tag} AS (
  SELECT doc_id, lane, v,
         min(CASE WHEN v IS NOT NULL THEN lane END) OVER
             (PARTITION BY doc_id ORDER BY lane
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt,
         min(CASE WHEN v IS NOT NULL THEN lane END) OVER
             (PARTITION BY doc_id) AS fst
  FROM lx_{tag}
), dn_{tag} AS MATERIALIZED (
  SELECT a.doc_id, a.lane,
         CASE WHEN a.v IS NOT NULL THEN a.v
              ELSE sm64((s.v + (COALESCE(a.nxt, a.fst + {nlanes}) - a.lane))
                        % {M})
         END AS v
  FROM nf_{tag} a
  JOIN bm_{tag} s ON s.doc_id = a.doc_id
              AND s.lane = (COALESCE(a.nxt, a.fst + {nlanes}) % {nlanes})
  UNION ALL
  -- empty-input sentinel: no shingles/tokens => every lane = 2^64-1
  SELECT e.doc_id, l.lane, CAST({SENT} AS HUGEINT) AS v
  FROM (SELECT doc_id FROM norm WHERE length(t0) = 0) e
  CROSS JOIN (SELECT unnest(range(0, {nlanes})) AS lane) l
)"""

    sql = f"""
CREATE OR REPLACE MACRO xr(a, b) AS CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT);
CREATE OR REPLACE MACRO shr(a, n) AS CAST(a AS HUGEINT) // (CAST(1 AS HUGEINT) << n);
CREATE OR REPLACE MACRO mulmod64(a, b) AS (
  ((a % 4294967296) * (b % 4294967296)
   + (((a % 4294967296) * (b // 4294967296) + (a // 4294967296) * (b % 4294967296)) % 4294967296) * 4294967296
  ) % {M});
CREATE OR REPLACE MACRO smz1(x) AS mulmod64(xr(x, shr(x, 30)), CAST(13787848793156543929 AS HUGEINT));
CREATE OR REPLACE MACRO smz2(x) AS mulmod64(xr(x, shr(x, 27)), CAST(10723151780598845931 AS HUGEINT));
CREATE OR REPLACE MACRO smz3(x) AS xr(x, shr(x, 31));
CREATE OR REPLACE MACRO sm64(x) AS smz3(smz2(smz1((CAST(x AS HUGEINT) + 11400714819323198485) % {M})));
CREATE OR REPLACE MACRO strh64(s) AS (
  sm64((CASE WHEN length(s) = 0 THEN CAST(0 AS HUGEINT)
        ELSE list_reduce(list_transform(range(1, length(s) + 1),
               i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS HUGEINT)),
               (a, b) -> (mulmod64(a, CAST(1099511628211 AS HUGEINT)) + b) % 18446744073709551616)
        END + length(s)) % 18446744073709551616)
);
CREATE OR REPLACE MACRO strh60(s) AS CAST(strh64(s) // 16 AS BIGINT);
WITH RECURSIVE src AS (
@SRC@
), base AS (
  SELECT doc_id, lang, path, repo_key,
         length(text) AS n_chars,
         sha256(text) AS sha
  FROM src
), norm AS (
  SELECT doc_id,
    lower(trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, '(?s)/\\*.*?\\*/', '', 'g'),
            $dq$(?s)@DQ@.*?@DQ@$dq$, '', 'g'),
          $sq$(?s)@SQ@.*?@SQ@$sq$, '', 'g'),
        '(#|//|--)[^\\n]*', '', 'g'),
      '\\s+', ' ', 'g'))) AS t0
  FROM src
), reps AS (
  -- exact-dedup representatives: the ENGINE's r4 rule, recomputed —
  -- rep = min (rep_key, doc order) per content sha, where rep_key =
  -- md5(repo || 0x1f || path) is a pure function of the natural key.
  -- (Same-sha members share every sketch but may differ in lang/path,
  -- which feed the P4 rule and the JW term — sf0.1 exposed exactly
  -- this, so rep election must match bit-for-bit.)
  SELECT b.doc_id, b.lang, b.path, b.n_chars, b.sha,
         first_value(b.doc_id) OVER (
             PARTITION BY b.sha
             ORDER BY md5(b.repo_key), b.doc_id
         ) AS rep_doc
  FROM base b
), pad12 AS (
  SELECT doc_id,
         CASE WHEN length(t0) < 12 THEN t0 || repeat(' ', 12 - length(t0))
              ELSE t0 END AS t
  FROM norm WHERE length(t0) > 0
), pad4 AS (
  SELECT doc_id,
         CASE WHEN length(t0) < 4 THEN t0 || repeat(' ', 4 - length(t0))
              ELSE t0 END AS t
  FROM norm WHERE length(t0) > 0
), h12 AS (
  SELECT doc_id,
    sm64(sm64((
        {terms(POW12, 12)}
    ) % {M}) + {OFF_MH}) AS h
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 10)) AS i FROM pad12)
), h4 AS (
  SELECT doc_id,
    sm64(sm64((
        {terms(POW4, 4)}
    ) % {M}) + {OFF_FMH}) AS h
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i FROM pad4)
), tk AS (
  -- DISTINCT: OPH is duplicate-insensitive; aggregating per-occurrence
  -- rows would sum repeated tokens' char terms together
  SELECT DISTINCT doc_id, w, length(w) AS L
  FROM (SELECT doc_id, unnest(string_split(t0, ' ')) AS w
        FROM norm WHERE length(t0) > 0)
  WHERE w <> ''
), pinv AS (
  SELECT 0 AS p, CAST(1 AS HUGEINT) AS v
  UNION ALL
  SELECT p + 1, mulmod64(v, CAST({PINV} AS HUGEINT))
  FROM pinv WHERE p < (SELECT max(L) FROM tk)
), htok AS (
  SELECT doc_id,
         sm64(sm64((CAST(sum(mulmod64(
             CAST(ascii(substr(w, CAST(i AS INT), 1)) AS HUGEINT), p.v))
             % {M} AS HUGEINT) + L) % {M}) + {OFF_TMH}) AS h
  FROM (SELECT doc_id, w, L, unnest(range(1, L + 1)) AS i FROM tk) c
  JOIN pinv p ON p.p = c.i - 1
  GROUP BY doc_id, w, L
)
{sketch_ctes("mh", "h12", 128, 57)}
{sketch_ctes("fmh", "h4", 128, 57)}
{sketch_ctes("tmh", "htok", 64, 58)}
, bk1 AS (
  SELECT doc_id, lane // 4 AS band, list(v ORDER BY lane) AS s
  FROM dn_mh GROUP BY 1, 2
), bk2 AS (
  SELECT doc_id, band, s, sm64(s[1]) AS f1 FROM bk1
), bk3 AS (
  SELECT doc_id, band, s, sm64((mulmod64(f1, {POLY}) + s[2]) % {M}) AS f2 FROM bk2
), bk4 AS (
  SELECT doc_id, band, s, sm64((mulmod64(f2, {POLY}) + s[3]) % {M}) AS f3 FROM bk3
), bk5 AS (
  SELECT doc_id, band, sm64((mulmod64(f3, {POLY}) + s[4]) % {M}) AS f4 FROM bk4
), bkeys AS MATERIALIZED (
  SELECT doc_id, band,
         sm64((f4 + band * {1 << 56}) % {M}) AS k
  FROM bk5
  JOIN (SELECT doc_id AS rd FROM reps WHERE doc_id = rep_doc) r
    ON r.rd = doc_id
), cand AS MATERIALIZED (
  SELECT DISTINCT da, db FROM (
    SELECT a.doc_id AS da, b.doc_id AS db
    FROM bkeys a JOIN bkeys b ON a.k = b.k AND a.doc_id < b.doc_id
    @CAND_EXTRA@
  )
), jacc_p AS (
  SELECT c.da, c.db,
         CAST(sum(CASE WHEN (x.v % 65536) = (y.v % 65536) THEN 1 ELSE 0 END)
              AS DOUBLE) / 64.0 AS jacc
  FROM cand c
  JOIN dn_mh x ON x.doc_id = c.da AND x.lane < 64
  JOIN dn_mh y ON y.doc_id = c.db AND y.lane = x.lane
  GROUP BY 1, 2
), tjacc_p AS (
  SELECT c.da, c.db,
         CAST(sum(CASE WHEN (x.v % 65536) = (y.v % 65536) THEN 1 ELSE 0 END)
              AS DOUBLE) / 32.0 AS tjacc
  FROM cand c
  JOIN dn_tmh x ON x.doc_id = c.da AND x.lane < 32
  JOIN dn_tmh y ON y.doc_id = c.db AND y.lane = x.lane
  GROUP BY 1, 2
), fj_p AS (
  SELECT c.da, c.db,
         CAST(sum(CASE WHEN (x.v % 65536) = (y.v % 65536) THEN 1 ELSE 0 END)
              AS DOUBLE) / 64.0 AS fj
  FROM cand c
  JOIN dn_fmh x ON x.doc_id = c.da AND x.lane < 64
  JOIN dn_fmh y ON y.doc_id = c.db AND y.lane = x.lane
  GROUP BY 1, 2
), scored0 AS MATERIALIZED (
  SELECT j.da, j.db, j.jacc, t.tjacc, f.fj,
         ra.lang AS lang_a, rb.lang AS lang_b,
         ra.path AS path_a, rb.path AS path_b,
         CASE WHEN greatest(ra.n_chars, rb.n_chars) > 0
              THEN CAST(least(ra.n_chars, rb.n_chars) AS DOUBLE)
                   / CAST(greatest(ra.n_chars, rb.n_chars) AS DOUBLE)
              ELSE CAST(1.0 AS DOUBLE) END AS size_sim,
         substr(ra.sha, 1, 16) = substr(rb.sha, 1, 16) AS exact
  FROM jacc_p j
  JOIN tjacc_p t ON t.da = j.da AND t.db = j.db
  JOIN fj_p f ON f.da = j.da AND f.db = j.db
  JOIN reps ra ON ra.doc_id = j.da
  JOIN reps rb ON rb.doc_id = j.db
), scored1 AS (
  SELECT *,
         (jacc >= CAST(0.25 AS DOUBLE) OR exact
          OR fj >= CAST(0.25 AS DOUBLE)) AS gate,
         CAST(0.55 AS DOUBLE) * jacc + CAST(0.3 AS DOUBLE) * tjacc
             + CAST(0.1 AS DOUBLE) * size_sim AS base
  FROM scored0
), scored2 AS (
  SELECT *,
         CASE WHEN gate AND NOT exact
                   AND base + CAST(0.05 AS DOUBLE) >= CAST({LO} AS DOUBLE)
                   AND base < CAST({HI} AS DOUBLE)
              THEN jaro_winkler_similarity(path_a, path_b)
              ELSE CAST(0.0 AS DOUBLE) END AS jw
  FROM scored1
), scored AS MATERIALIZED (
  SELECT da, db, lang_a, lang_b, tjacc, jw, size_sim,
         CASE WHEN exact THEN CAST(1.0 AS DOUBLE)
              WHEN NOT gate THEN CAST(0.0 AS DOUBLE)
              ELSE greatest(base + CAST(0.05 AS DOUBLE) * jw,
                            CAST(0.35 AS DOUBLE) * jacc
                            + CAST(0.65 AS DOUBLE) * fj) END AS score,
         exact
  FROM scored2
), band_pairs AS (
  SELECT * FROM scored
  WHERE score >= CAST({LO} AS DOUBLE) AND score < CAST({HI} AS DOUBLE)
), g12 AS MATERIALIZED (
  SELECT DISTINCT p.doc_id, substr(t, CAST(i AS INT), 12) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 10)) AS i FROM pad12) p
  WHERE p.doc_id IN (SELECT da FROM band_pairs UNION SELECT db FROM band_pairs)
), g4 AS MATERIALIZED (
  SELECT DISTINCT p.doc_id, substr(t, CAST(i AS INT), 4) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i FROM pad4) p
  WHERE p.doc_id IN (SELECT da FROM band_pairs UNION SELECT db FROM band_pairs)
), jx12 AS (
  SELECT b.da, b.db,
         (SELECT count(*) FROM g12 x JOIN g12 y
          ON x.g = y.g AND x.doc_id = b.da AND y.doc_id = b.db) AS inter,
         (SELECT count(*) FROM g12 WHERE doc_id = b.da) AS na,
         (SELECT count(*) FROM g12 WHERE doc_id = b.db) AS nb
  FROM band_pairs b
), jx4 AS (
  SELECT b.da, b.db,
         (SELECT count(*) FROM g4 x JOIN g4 y
          ON x.g = y.g AND x.doc_id = b.da AND y.doc_id = b.db) AS inter,
         (SELECT count(*) FROM g4 WHERE doc_id = b.da) AS na,
         (SELECT count(*) FROM g4 WHERE doc_id = b.db) AS nb
  FROM band_pairs b
), rescored AS (
  SELECT b.da, b.db,
         greatest(
           CAST(0.55 AS DOUBLE) * j12.j + CAST(0.3 AS DOUBLE) * b.tjacc
               + CAST(0.05 AS DOUBLE) * b.jw
               + CAST(0.1 AS DOUBLE) * b.size_sim,
           CAST(0.35 AS DOUBLE) * j12.j + CAST(0.65 AS DOUBLE) * j4.j
         ) AS score,
         b.lang_a = b.lang_b AS lang_ok
  FROM band_pairs b
  JOIN (SELECT da, db,
               CASE WHEN na + nb = 0 THEN CAST(1.0 AS DOUBLE)
                    WHEN na + nb - inter = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
               END AS j
        FROM jx12) j12 ON j12.da = b.da AND j12.db = b.db
  JOIN (SELECT da, db,
               CASE WHEN na + nb = 0 THEN CAST(1.0 AS DOUBLE)
                    WHEN na + nb - inter = 0 THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
               END AS j
        FROM jx4) j4 ON j4.da = b.da AND j4.db = b.db
), scored_final AS MATERIALIZED (
  -- the engine's post-rescore scored_pairs: rows outside the band pass
  -- through stage-2 untouched; band rows carry the exact-content blend
  SELECT da, db, score,
         score >= CAST(0.5 AS DOUBLE) AND (lang_a = lang_b OR exact)
             AS is_match
  FROM scored
  WHERE score < CAST({LO} AS DOUBLE) OR score >= CAST({HI} AS DOUBLE)
  UNION ALL
  SELECT da, db, score,
         score >= CAST(0.5 AS DOUBLE) AND lang_ok AS is_match
  FROM rescored
), match_edges AS (
  SELECT da AS src, db AS dst FROM scored_final WHERE is_match
  UNION ALL
  SELECT doc_id, rep_doc FROM reps WHERE doc_id <> rep_doc
), edges AS (
  SELECT src, dst FROM match_edges
  UNION
  SELECT dst, src FROM match_edges
), reach AS (
  SELECT doc_id AS id, doc_id AS lab FROM src
  UNION
  SELECT e.dst AS id, r.lab
  FROM reach r JOIN edges e ON e.src = r.id
), comp AS (
  SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY 1
), sizes AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM comp GROUP BY 1
)
@TAIL@
"""
    default_tail = (
        "SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters\n"
        "FROM sizes GROUP BY 1 ORDER BY 1"
    )
    default_src = (
        "  SELECT doc_id, lang,\n"
        "         'docs/doc_' || doc_id || '.txt' AS path,\n"
        "         source || chr(31) || 'docs/doc_' || doc_id || '.txt'"
        " AS repo_key,\n"
        "         COALESCE(text, '') AS text\n"
        "  FROM documents"
    )
    return (
        sql.replace("@DQ@", '"' * 3)
        .replace("@SQ@", "'" * 3)
        .replace("@TAIL@", tail or default_tail)
        .replace("@SRC@", src or default_src)
        .replace("@CAND_EXTRA@", cand_extra or "")
    )


ORACLE_SQL["minhash_lsh_clusters"] = _build_flagship_lsh_sql()

ORACLE_SQL["lsh_cluster_assignments"] = _build_flagship_lsh_sql(
    tail=(
        "SELECT c.doc_id, CAST(c.cluster_id AS BIGINT) AS cluster_label,\n"
        "       s.cluster_size\n"
        "FROM comp c JOIN sizes s ON s.cluster_id = c.cluster_id\n"
        "ORDER BY c.doc_id"
    )
)

# Post-rescore score distribution: same floor(score*20) bin arithmetic
# the engine applies to res.scored_pairs (clip is a no-op for scores in
# [0,1] except the exact-1.0 bin, mirrored by least(...)).
ORACLE_SQL["score_histogram"] = _build_flagship_lsh_sql(
    tail=(
        "SELECT CAST(least(greatest(CAST(floor(score * 20) AS BIGINT), 0), 20)\n"
        "            AS BIGINT) AS score_bin,\n"
        "       CAST(count(*) AS BIGINT) AS n_pairs\n"
        "FROM scored_final GROUP BY 1 ORDER BY 1"
    )
)

# Canonical (golden) record per flagship cluster: member count, min doc
# id, char extremes — cluster ids (128-bit binary) drop out, the
# comparison is the per-cluster multiset.
ORACLE_SQL["cluster_canonical"] = _build_flagship_lsh_sql(
    tail=(
        "SELECT CAST(count(*) AS BIGINT) AS n_members,\n"
        "       CAST(min(d.doc_id) AS BIGINT) AS rep_doc_id,\n"
        "       CAST(max(length(COALESCE(d.text, ''))) AS BIGINT) AS max_chars,\n"
        "       CAST(sum(length(COALESCE(d.text, ''))) AS BIGINT) AS total_chars\n"
        "FROM comp c JOIN documents d ON d.doc_id = c.doc_id\n"
        "GROUP BY c.cluster_id\n"
        "ORDER BY rep_doc_id"
    )
)

# PR operating-point sweep over the dup-dense FIXTURE corpus: the SAME
# flagship twin retargeted via the src hook to the generator's parquet
# (inputs to both engines — the query writes/reuses the deterministic
# cache dir before the oracle runs), truth joined from labels.parquet on
# the natural key.  This is also the dup-dense oracle evidence run the
# sf-scale corpora don't exercise (clusters of ~6 variants per seed).
def _fixture_pr_paths() -> tuple[str, str]:
    import os as _os

    root = _os.environ.get("APR_FIXTURE_CACHE_ROOT", "/tmp")
    base = _os.path.join(root, "apr_qgen_corpus_pr_s200_v6_h10")
    return _os.path.join(base, "corpus"), _os.path.join(base, "labels")


def _build_pr_curve_sql() -> str:
    corpus_dir, labels_dir = _fixture_pr_paths()
    src = f"""
  SELECT row_number() OVER (ORDER BY repo, path, "commit") AS doc_id,
         lang, path,
         repo || chr(31) || path AS repo_key,
         COALESCE(content, '') AS text,
         repo, "commit"
  FROM read_parquet('{corpus_dir}/*.parquet')
"""
    tail = f""", truth AS (
  SELECT s.doc_id, l.cluster_id AS tc
  FROM src s JOIN read_parquet('{labels_dir}/*.parquet') l
    ON l.repo = s.repo AND l.path = s.path AND l."commit" = s."commit"
), bins AS (
  SELECT CAST(floor(sf.score * 20 + 0.0000001) AS BIGINT) AS bp,
         ta.tc = tb.tc AS same
  FROM scored_final sf
  JOIN truth ta ON ta.doc_id = sf.da
  JOIN truth tb ON tb.doc_id = sf.db
), th AS (
  SELECT unnest(range(0, 21)) AS t
), tot AS (
  SELECT CAST(COALESCE(sum(CASE WHEN same THEN 1 ELSE 0 END), 0) AS BIGINT)
      AS n_true
  FROM bins
), agg AS (
  SELECT th.t,
         CAST(COALESCE(sum(CASE WHEN b.bp >= th.t AND b.same
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
         CAST(COALESCE(sum(CASE WHEN b.bp >= th.t AND NOT b.same
                           THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp
  FROM th LEFT JOIN bins b ON true
  GROUP BY th.t
), ppm AS (
  SELECT a.t, a.tp, a.fp, tot.n_true - a.tp AS fn,
         a.tp * 1000000 // greatest(a.tp + a.fp, 1) AS precision_ppm,
         a.tp * 1000000 // greatest(tot.n_true, 1) AS recall_ppm
  FROM agg a, tot
)
SELECT CAST(t * 500 AS BIGINT) AS threshold_bp, tp, fp, fn,
       precision_ppm, recall_ppm,
       2 * precision_ppm * recall_ppm
           // greatest(precision_ppm + recall_ppm, 1) AS f1_ppm
FROM ppm ORDER BY 1
"""
    # M18 exact (lang, basename) blocking key over the rep set — the
    # fixture's variants share basenames, so this key contributes
    # candidates the documents-corpus twin never needed to model
    cand_extra = """
    UNION ALL
    SELECT a.doc_id, b.doc_id FROM
      (SELECT doc_id, lang, regexp_replace(path, '^.*/', '') AS bn
       FROM reps WHERE doc_id = rep_doc) a
      JOIN
      (SELECT doc_id, lang, regexp_replace(path, '^.*/', '') AS bn
       FROM reps WHERE doc_id = rep_doc) b
      ON a.lang = b.lang AND a.bn = b.bn AND a.doc_id < b.doc_id
"""
    return _build_flagship_lsh_sql(tail=tail, src=src, cand_extra=cand_extra)


ORACLE_SQL["pr_curve"] = _build_pr_curve_sql()


# Per-cluster edge density: decided edges (score >= 0.5, both endpoints
# same cluster) over C(n,2) in integer ppm; inner-join semantics (a
# cluster without a decided scored edge drops out, as in the engine).
ORACLE_SQL["cluster_density"] = _build_flagship_lsh_sql(
    tail=(
        "SELECT m.n_members, e.n_edges,\n"
        "       CAST(e.n_edges * 1000000 //\n"
        "            greatest(m.n_members * (m.n_members - 1) // 2, 1)\n"
        "            AS BIGINT) AS density_ppm\n"
        "FROM (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members\n"
        "      FROM comp GROUP BY 1) m\n"
        "JOIN (SELECT c1.cluster_id, CAST(count(*) AS BIGINT) AS n_edges\n"
        "      FROM scored_final s\n"
        "      JOIN comp c1 ON c1.doc_id = s.da\n"
        "      JOIN comp c2 ON c2.doc_id = s.db\n"
        "               AND c2.cluster_id = c1.cluster_id\n"
        "      WHERE s.score >= CAST(0.5 AS DOUBLE) GROUP BY 1) e\n"
        "  ON e.cluster_id = m.cluster_id\n"
        "WHERE m.n_members >= 2\n"
        "ORDER BY m.n_members, e.n_edges"
    )
)

# LSH candidates verified by exact distinct 4-gram Jaccard over the RAW
# text (engine: hash-set Jaccard — collision-free assumption), emitted
# as (least, greatest) doc pairs.
ORACLE_SQL["ngram_jaccard_pairs"] = _build_flagship_lsh_sql(
    tail=""", rawpad4 AS (
  SELECT doc_id,
         CASE WHEN length(t) < 4 THEN t || repeat(' ', 4 - length(t))
              ELSE t END AS t
  FROM (SELECT doc_id, COALESCE(text, '') AS t FROM documents)
  WHERE length(t) > 0
), rg4 AS MATERIALIZED (
  SELECT DISTINCT p.doc_id, substr(t, CAST(i AS INT), 4) AS g
  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i
        FROM rawpad4) p
  WHERE p.doc_id IN (SELECT da FROM cand UNION SELECT db FROM cand)
), jraw AS (
  SELECT c.da, c.db,
         (SELECT count(*) FROM rg4 x JOIN rg4 y
          ON x.g = y.g AND x.doc_id = c.da AND y.doc_id = c.db) AS inter,
         (SELECT count(*) FROM rg4 WHERE doc_id = c.da) AS na,
         (SELECT count(*) FROM rg4 WHERE doc_id = c.db) AS nb
  FROM cand c
), jv AS (
  SELECT da, db,
         CASE WHEN na + nb = 0 THEN CAST(1.0 AS DOUBLE)
              WHEN na + nb - inter = 0 THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE)
         END AS j
  FROM jraw
)
SELECT CAST(least(da, db) AS BIGINT) AS doc_a,
       CAST(greatest(da, db) AS BIGINT) AS doc_b,
       floor(j * 10000) / 10000 AS jaccard
FROM jv WHERE j >= CAST(0.5 AS DOUBLE)
ORDER BY doc_a, doc_b"""
)

# Blocking observability: histogram of block sizes over the reps' LSH
# band keys (recomputed, bkeys CTE) plus the exact (lang, basename)
# blocks — sizes only, so the exact key's blake2b VALUE is not needed;
# assumes no value collision between the exact-key and band-key spaces
# (disjoint hash families, 2^-64).
ORACLE_SQL["block_size_histogram"] = _build_flagship_lsh_sql(
    tail=""", bsz AS (
  SELECT CAST(count(*) AS BIGINT) AS block_size FROM bkeys GROUP BY k
  UNION ALL
  SELECT CAST(count(*) AS BIGINT)
  FROM reps WHERE doc_id = rep_doc
  GROUP BY lang, 'doc_' || doc_id || '.txt'
)
SELECT block_size, CAST(count(*) AS BIGINT) AS n_blocks
FROM bsz GROUP BY 1 ORDER BY 1"""
)

# Canopy clustering (McCallum/Nigam/Ungar 2000) — the VERDICT-r3 claim
# that the sequential greedy is SQL-expressible holds via a recursive
# CTE: each iteration elects the min-remaining doc per lang as center
# (window functions — single reference to the recursive relation),
# updates every row of that lang (T1 = 22 membership counts, T2 = 14
# removal), and stops when a lang has no remaining docs; the terminal
# state per doc is its max-iteration row.  Rides the PROVEN simhash
# recomputation (same sketch the engine's Fingerprinter emits).
_CANOPY_TAIL = """, docs0 AS MATERIALIZED (
  SELECT a.doc_id, d.lang, a.sh
  FROM allsim a JOIN documents d USING (doc_id)
), rec AS (
  SELECT doc_id, lang, sh, true AS remaining,
         CAST(NULL AS BIGINT) AS primary_id,
         CAST(0 AS BIGINT) AS n_can, 0 AS it
  FROM docs0
  UNION ALL
  SELECT doc_id, lang, sh,
         remaining AND bit_count(xor(sh, csh)) > 14,
         COALESCE(primary_id,
                  CASE WHEN bit_count(xor(sh, csh)) <= 22 THEN cid END),
         n_can + CASE WHEN bit_count(xor(sh, csh)) <= 22 THEN 1 ELSE 0 END,
         it + 1
  FROM (
    SELECT r.*,
           min(CASE WHEN remaining THEN doc_id END)
               OVER (PARTITION BY lang) AS cid,
           first_value(sh) OVER (
               PARTITION BY lang
               ORDER BY (CASE WHEN remaining THEN 0 ELSE 1 END), doc_id
           ) AS csh
    FROM rec r
  )
  WHERE cid IS NOT NULL AND it < 4096
), fin AS (
  SELECT doc_id, lang, primary_id, n_can,
         row_number() OVER (PARTITION BY doc_id ORDER BY it DESC) AS rn
  FROM rec
)
SELECT doc_id, lang,
       CAST(COALESCE(primary_id, doc_id) AS BIGINT) AS canopy_id,
       CAST(n_can + CASE WHEN primary_id IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS n_canopies
FROM fin WHERE rn = 1 ORDER BY doc_id"""

ORACLE_SQL["canopy_clusters"] = _build_simhash_sql(
    tail=_CANOPY_TAIL
).replace("WITH norm AS (", "WITH RECURSIVE norm AS (", 1)


# Packed-shard panel: the writer's prefix-sum packing rule as a window
# function (EOS-inclusive token counts: ws tokens + 1; T6 split rule;
# doc_id % 16 scan buckets; capacity 512).
ORACLE_SQL["packed_shard_stats"] = r"""
    WITH tok AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(COALESCE(text, '')), '\s+'))
                   + 1 AS nt,
               CASE WHEN doc_id % 10 = 0 THEN 'heldout' ELSE 'train'
               END AS split,
               doc_id % 16 AS bucket
        FROM documents
    ), w AS (
        SELECT split, bucket, nt,
               COALESCE(sum(nt) OVER (
                   PARTITION BY split, bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS before
        FROM tok
    ), seq AS (
        SELECT split, bucket, before // 512 AS batch_id,
               CAST(sum(nt) AS BIGINT) AS seq_tokens,
               CAST(count(*) AS BIGINT) AS nd
        FROM w GROUP BY 1, 2, 3
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_sequences,
           CAST(sum(nd) AS BIGINT) AS n_docs,
           CAST(sum(seq_tokens) AS BIGINT) AS n_tokens,
           CAST(max(seq_tokens) AS BIGINT) AS max_seq_tokens
    FROM seq GROUP BY 1 ORDER BY 1
"""

# Residual-token extraction per matched pair: distinct raw-text tokens
# of one side absent from the other (anti-join count), canonical
# (min, max) doc orientation; match pairs = the flagship scored_final.
ORACLE_SQL["residual_tokens"] = _build_flagship_lsh_sql(
    tail=""", rtok AS MATERIALIZED (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id, unnest(string_split(COALESCE(text, ''), ' ')) AS w
    FROM documents)
  WHERE w <> ''
), mp AS (
  SELECT least(da, db) AS da, greatest(da, db) AS db
  FROM scored_final WHERE is_match
), resid AS (
  SELECT m.da, m.db,
         (SELECT count(*) FROM rtok x
          WHERE x.doc_id = m.da AND NOT EXISTS (
              SELECT 1 FROM rtok y WHERE y.doc_id = m.db AND y.w = x.w))
             AS residual_a,
         (SELECT count(*) FROM rtok x
          WHERE x.doc_id = m.db AND NOT EXISTS (
              SELECT 1 FROM rtok y WHERE y.doc_id = m.da AND y.w = x.w))
             AS residual_b
  FROM mp m
)
SELECT CAST(da AS BIGINT) AS doc_a, CAST(db AS BIGINT) AS doc_b,
       CAST(residual_a AS BIGINT) AS residual_a,
       CAST(residual_b AS BIGINT) AS residual_b
FROM resid ORDER BY doc_a, doc_b"""
)

# Bigram-LM rarity score: corpus bigram counts + per-doc integer mean
# rarity; tokens follow the pinned trim/regexp_split rule (one empty
# token for the empty string => no bigrams => sentinel -1).
ORACLE_SQL["bigram_lm_score"] = r"""
    WITH tok AS (
        SELECT doc_id, lang,
               regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS w
        FROM documents
    ), bg AS (
        SELECT doc_id, lang,
               w[i] || chr(31) || w[i + 1] AS b
        FROM (SELECT doc_id, lang, w,
                     unnest(generate_series(1, len(w) - 1)) AS i
              FROM tok)
    ), cnt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS n FROM bg GROUP BY 1
    ), sc AS (
        SELECT bg.doc_id, bg.lang,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(1000000 // (1 + cnt.n)) // count(*) AS BIGINT)
                   AS score_ppm
        FROM bg JOIN cnt ON cnt.b = bg.b
        GROUP BY 1, 2
    )
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(sc.score_ppm, -1) AS BIGINT) AS score_ppm
    FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
    ORDER BY d.doc_id
"""

# Bloom membership sketch: 2^16-bit / k=4 double-hashing filter over the
# benchmark slice's token 5-grams; hits where ALL 4 positions are set.
# h1 = strh60(g) % 2^16, h2 = (strh60(g) // 2^16) % (2^16 - 1) + 1.
ORACLE_SQL["bloom_contamination"] = _STRH_PRELUDE + r"""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(COALESCE(text, '')), '\s+') AS tl
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id, array_to_string(list_slice(tl, i, i + 4), ' ') AS g
        FROM toks, unnest(range(1, greatest(len(tl) - 3, 1))) AS t(i)
        WHERE len(tl) >= 5
    ), gh AS (
        SELECT g,
               CAST(strh60(g) % 65536 AS BIGINT) AS h1,
               CAST((strh60(g) // 65536) % 65535 + 1 AS BIGINT) AS h2
        FROM (SELECT DISTINCT g FROM grams)
    ), bench AS (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    ), bits AS (
        SELECT DISTINCT (gh.h1 + i * gh.h2) % 65536 AS bit
        FROM gh JOIN bench USING (g),
             unnest(range(0, 4)) AS k(i)
    ), probe AS (
        SELECT gr.doc_id, gr.g,
               count(b.bit) = 4 AS bloom_hit
        FROM grams gr
        JOIN gh USING (g)
        CROSS JOIN unnest(range(0, 4)) AS k(i)
        LEFT JOIN bits b ON b.bit = (gh.h1 + i * gh.h2) % 65536
        GROUP BY 1, 2
    ), per_doc AS (
        SELECT p.doc_id,
               bool_or(p.bloom_hit) AS bloom,
               bool_or(p.bloom_hit AND bn.g IS NOT NULL) AS exact
        FROM probe p LEFT JOIN bench bn ON bn.g = p.g
        GROUP BY 1
    ), lang_panel AS (
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN pd.bloom THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bloom_flagged,
               CAST(sum(CASE WHEN pd.exact THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated
        FROM documents d LEFT JOIN per_doc pd ON pd.doc_id = d.doc_id
        GROUP BY 1
    )
    SELECT lang, n_docs, n_bloom_flagged, n_contaminated,
           n_bloom_flagged - n_contaminated AS n_false_pos,
           (SELECT CAST(count(*) AS BIGINT) FROM bits) AS filter_bits_set
    FROM lang_panel ORDER BY lang
"""

# Integer A-ES weighted sample: rank = (sm64(doc_id + salt) >> 4) //
# max(n_chars, 1), ascending top-K with doc_id tie-break (salt 1001 =
# queries._WRS_SALT).
ORACLE_SQL["size_weighted_sample"] = _STRH_PRELUDE + """
    WITH r AS (
        SELECT doc_id, lang, n_chars,
               CAST(sm64((CAST(doc_id AS HUGEINT) + 1001)
                         % 18446744073709551616) // 16
                   // greatest(n_chars, 1) AS BIGINT) AS rank
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars, rank
    FROM r ORDER BY rank, doc_id LIMIT 25
"""

# Prepend the strh60 macro prelude to every oracle that calls it (the
# entries above stay readable as pure SELECTs; DuckDB executes the
# multi-statement string and returns the last result).
for _k in (
    "distinct_kmv",
    "weighted_sample",
    "hll_distinct",
    "partition_digests",
    "table_profile",
    "stratified_sample",
    "mixture_sample",
    "pii_scrub",
    "doc_chunks",
):
    ORACLE_SQL[_k] = _STRH_PRELUDE + ORACLE_SQL[_k]
del _k

# Incremental-linkage equivalence: the engine splits the corpus 80/20,
# dedups the 80, attaches the 20 incrementally and compares against the
# full run.  The oracle pins the CLAIM the op exists to make — the
# incremental result must be bit-identical to the full run (the full
# run itself is verified against the flagship DuckDB twin via
# lsh_cluster_assignments): n_records = corpus size, labels_identical,
# F1 = 1.0.  Any incremental/full divergence flips the engine's
# booleans and hash-fails this oracle.
ORACLE_SQL["incremental_dedup_check"] = """
    SELECT CAST(count(*) AS BIGINT) AS n_records,
           true AS labels_identical,
           CAST(1000000 AS BIGINT) AS f1_vs_full_1e6
    FROM documents
"""
