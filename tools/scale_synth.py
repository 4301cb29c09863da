#!/usr/bin/env python3
"""Synthesize a scaling-probe fixture from driver sf0.1 data (driver-side
tooling, like verify_local.py — the engine never depends on this).

Replicates documents/embeddings `factor` times with disjoint id ranges.
Replica content is rotated, with different effects per modality:

- embeddings: replica k's vector is the original rotated by k positions —
  unit norm preserved, cosine genuinely decorrelated, so kNN/ANN
  neighborhoods don't collapse onto exact copies.
- documents: replica k's text is the original's words rotated by k
  positions. Rotations of one word sequence share almost all CYCLIC
  3-gram shingles, so each replica family remains a mutual near-dup
  clique of `factor` members — deliberate: LSH bucket sizes stay bounded
  by the factor (well under the capBuckets guard) while verified-pair
  volume grows ~factor² per family, a denser-duplication stress test
  than fresh-unique texts would be (measured: 1,375 -> 401,056 verified
  pairs sf0.1 -> 10x while q_near_dup runtime grew only ~11x).

Document id shifts are multiples of the base count (5000 at sf0.1), a
multiple of every modulus the query fixtures key on (10/20/100), so edge
densities are preserved exactly. Embedding id shifts additionally must
CLEAR the engine's query cap (`vec_id % 100 = 0 AND vec_id < 3200`,
SimilarityQueries.maxQueryId): a shift smaller than 3200 would inject
replica vectors into the capped query set and silently grow the query
side of every kNN/ANN probe — so the shift is max(count, 3200), keeping
the query set EXACTLY the base one (the asserted invariant below).

Usage: python3 tools/scale_synth.py <srcDir> <dstDir> [factor=10]
"""
import sys

import duckdb


HOT_BLOCK = "aurum bolt cinder dray ember flux grove helix"


def main() -> None:
    src = sys.argv[1]
    dst = sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    hotblock = len(sys.argv) > 4 and "hotblock" in sys.argv[4:]
    ersupplier = len(sys.argv) > 4 and "ersupplier" in sys.argv[4:]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW d AS SELECT * FROM '{src}/documents.parquet'")
    con.execute(f"CREATE VIEW e AS SELECT * FROM '{src}/embeddings.parquet'")
    nd, = con.execute("SELECT count(*) FROM d").fetchone()
    ne, = con.execute("SELECT count(*) FROM e").fetchone()

    import os
    os.makedirs(dst, exist_ok=True)
    # hotblock mode (r8 verdict #4's skew stress): prepend ONE fixed
    # 8-word boilerplate block (exactly the engine's spanLen so it is one
    # whole dedup block at position 0, never straddling a boundary) to
    # every even FINAL doc_id — applied AFTER replica rotation, so 50% of
    # the full corpus carries the identical intact block, making the
    # block hash (q_span_dedup's dup-mark join key) and each of the 8
    # words (q_unigram_nll's keyed vocab join, q_vocab_encode's vocab
    # counts) deliberate hot keys. The words are not in the base corpus,
    # so the hot keys cannot be diluted by anything else.
    hot = (f"CASE WHEN doc_id % 2 = 0 THEN '{HOT_BLOCK} ' || text "
           "ELSE text END") if hotblock else "text"
    con.execute(f"""
      COPY (
        SELECT doc_id, {hot} AS text, lang, source, n_chars
        FROM (
          SELECT doc_id + k * {nd} AS doc_id,
            CASE WHEN k = 0 THEN text ELSE array_to_string(
              w[(k % greatest(len(w), 1)) + 1 :] || w[1 : (k % greatest(len(w), 1))],
              ' ') END AS text,
            lang, source, n_chars
          FROM (SELECT *, string_split(text, ' ') AS w FROM d),
               unnest(generate_series(0, {factor - 1})) AS g(k)
        )
      ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    # query cap read from the engine source (SimilarityQueries.maxQueryId)
    # so an engine-side cap change cannot silently reintroduce the
    # query-set leak this shift exists to prevent; 3200 fallback only if
    # the source moves. The cap is a multiple of both fixture moduli
    # (100 and 20).
    import pathlib
    import re
    scala = (pathlib.Path(__file__).resolve().parent.parent
             / "src/main/scala/graft/queries/SimilarityQueries.scala")
    m = re.search(r"maxQueryId\s*=\s*(\d+)", scala.read_text()) \
        if scala.exists() else None
    max_query_id = int(m.group(1)) if m else 3200
    eshift = max(ne, max_query_id)
    con.execute(f"""
      COPY (
        SELECT vec_id + k * {eshift} AS vec_id,
          CASE WHEN k = 0 THEN embedding ELSE
            embedding[(k % len(embedding)) + 1 :] || embedding[1 : (k % len(embedding))]
          END AS embedding,
          label
        FROM e, unnest(generate_series(0, {factor - 1})) AS g(k)
      ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # lineitem for q_heavy_hitters scaling: replica orderkeys shift by a
    # multiple of 16384 (any multiple of 1024 preserves both tier moduli,
    # since 1024 is itself a multiple of 16; 16384 is used for slack), so
    # the Zipf-tiered key derivation maps every replica hot/medium row
    # onto the SAME tier keys (counts x factor, shares invariant) while
    # cold keys stay distinct per replica — heavy set unchanged, key
    # space x factor. Guarded: probe fixtures built from doc-only dirs
    # still work.
    import os.path
    if os.path.exists(f"{src}/lineitem.parquet"):
        con.execute(
            f"CREATE VIEW li AS SELECT * FROM '{src}/lineitem.parquet'")
        nl, = con.execute("SELECT count(*) FROM li").fetchone()
        mx, = con.execute("SELECT max(l_orderkey) FROM li").fetchone()
        # the shift must clear BOTH fact tables' orderkey ranges so the
        # lineitem↔orders join stays consistent per replica (same shift
        # on both sides)
        if os.path.exists(f"{src}/orders.parquet"):
            con.execute(
                f"CREATE VIEW oo AS SELECT * FROM '{src}/orders.parquet'")
            mo, = con.execute("SELECT max(o_orderkey) FROM oo").fetchone()
            mx = max(mx, mo)
        oshift = ((mx // 16384) + 1) * 16384
        con.execute(f"""
          COPY (
            SELECT * REPLACE (l_orderkey + k * {oshift} AS l_orderkey)
            FROM li, unnest(generate_series(0, {factor - 1})) AS g(k)
          ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """)
        hot_base = con.execute(
            "SELECT l_orderkey % 16 AS r, count(*) FROM li "
            "WHERE l_orderkey % 16 < 8 GROUP BY r ORDER BY r").fetchall()
        hot_dst = con.execute(
            f"SELECT l_orderkey % 16 AS r, count(*) FROM "
            f"'{dst}/lineitem.parquet' "
            "WHERE l_orderkey % 16 < 8 GROUP BY r ORDER BY r").fetchall()
        assert hot_dst == [(r, c * factor) for r, c in hot_base], \
            "hot-tier counts must scale exactly by the factor"
        print(f"lineitem: {nl} -> {nl * factor} (hot tier x{factor} exact)")

        # orders replicates with the SAME shift (per-replica join keys line
        # up with that replica's lineitem; o_custkey is unchanged, so each
        # customer's order count scales x factor — the fact tables grow,
        # the dimensions don't, exactly the 100 TB star shape). Dimensions
        # (customer/supplier/nation/region) copy through verbatim so the
        # relational family (q3_top, q5_region, q_having_join) runs on the
        # probe fixture; part replicates with a p_partkey shift (p_type
        # kept, so per-type price means are invariant and
        # q_scalar_subquery's output scales x factor exactly).
        if os.path.exists(f"{src}/orders.parquet"):
            no, = con.execute("SELECT count(*) FROM oo").fetchone()
            con.execute(f"""
              COPY (
                SELECT * REPLACE (o_orderkey + k * {oshift} AS o_orderkey)
                FROM oo, unnest(generate_series(0, {factor - 1})) AS g(k)
              ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
            """)
            joined_base, = con.execute(
                "SELECT count(*) FROM li JOIN oo ON l_orderkey = o_orderkey"
            ).fetchone()
            joined_dst, = con.execute(
                f"SELECT count(*) FROM '{dst}/lineitem.parquet' "
                f"JOIN '{dst}/orders.parquet' ON l_orderkey = o_orderkey"
            ).fetchone()
            assert joined_dst == joined_base * factor, \
                "lineitem-orders join cardinality must scale exactly"
            print(f"orders: {no} -> {no * factor} (join x{factor} exact)")
        if os.path.exists(f"{src}/part.parquet"):
            con.execute(f"CREATE VIEW pp AS SELECT * FROM '{src}/part.parquet'")
            np_, = con.execute("SELECT count(*) FROM pp").fetchone()
            mp, = con.execute("SELECT max(p_partkey) FROM pp").fetchone()
            pshift = mp + 1
            con.execute(f"""
              COPY (
                SELECT * REPLACE (p_partkey + k * {pshift} AS p_partkey)
                FROM pp, unnest(generate_series(0, {factor - 1})) AS g(k)
              ) TO '{dst}/part.parquet' (FORMAT PARQUET)
            """)
            print(f"part: {np_} -> {np_ * factor}")
        # ersupplier mode (round-9 ER-family scaling): replicate supplier
        # with REGENERATED 9-digit names ('Supplier#' || lpad(new key)) —
        # the generator's own naming rule — so the FastSS match graph
        # grows naturally with the entity space (deletion-variant blocks
        # stay <=10 ids per digit position; candidate volume stays
        # ~27 pairs/name). Default leaves supplier verbatim because the
        # relational family's recorded 100x slopes assume the TPC-H star
        # shape (facts grow, dimensions don't).
        copy_dims = ["customer", "nation", "region"]
        if ersupplier and os.path.exists(f"{src}/supplier.parquet"):
            con.execute(f"CREATE VIEW sup AS SELECT * FROM '{src}/supplier.parquet'")
            ns, = con.execute("SELECT count(*) FROM sup").fetchone()
            ms, = con.execute("SELECT max(s_suppkey) FROM sup").fetchone()
            sshift = ms + 1
            con.execute(f"""
              COPY (
                SELECT s_suppkey + k * {sshift} AS s_suppkey,
                  'Supplier#' || lpad(CAST(s_suppkey + k * {sshift} AS VARCHAR),
                                      9, '0') AS s_name,
                  s_nationkey, s_acctbal
                FROM sup, unnest(generate_series(0, {factor - 1})) AS g(k)
              ) TO '{dst}/supplier.parquet' (FORMAT PARQUET)
            """)
            print(f"supplier: {ns} -> {ns * factor} (names regenerated)")
        else:
            copy_dims.insert(1, "supplier")
        for t in copy_dims:
            if os.path.exists(f"{src}/{t}.parquet"):
                con.execute(f"""
                  COPY (SELECT * FROM '{src}/{t}.parquet')
                  TO '{dst}/{t}.parquet' (FORMAT PARQUET)
                """)
        print(f"dimensions copied: {' '.join(copy_dims)}")

    # events for the temporal/analytics family: replicas shift event_id by
    # the base count (uniqueness) and user_id past the base max, so each
    # replica is a disjoint user population living on the SAME timeline —
    # per-user session/as-of structure is preserved exactly (sessions,
    # funnel chains, and as-of matches scale x factor with identical
    # per-user shapes) while per-type hourly volumes grow x factor
    # (anomaly z-scores keep their structure: mean and std both scale).
    if os.path.exists(f"{src}/events.parquet"):
        con.execute(f"CREATE VIEW ev AS SELECT * FROM '{src}/events.parquet'")
        nev, = con.execute("SELECT count(*) FROM ev").fetchone()
        mxu, = con.execute("SELECT max(user_id) FROM ev").fetchone()
        ushift = mxu + 1
        con.execute(f"""
          COPY (
            SELECT event_id + k * {nev} AS event_id, ts,
                   user_id + k * {ushift} AS user_id, event_type, value, props
            FROM ev, unnest(generate_series(0, {factor - 1})) AS g(k)
          ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """)
        base = con.execute(
            "SELECT event_type, count(*) FROM ev GROUP BY 1 ORDER BY 1"
        ).fetchall()
        dstc = con.execute(
            f"SELECT event_type, count(*) FROM '{dst}/events.parquet' "
            "GROUP BY 1 ORDER BY 1").fetchall()
        assert dstc == [(t, c * factor) for t, c in base], \
            "per-type event counts must scale exactly by the factor"
        print(f"events: {nev} -> {nev * factor} (per-type x{factor} exact)")

    for t, n in (("documents", nd), ("embeddings", ne)):
        got, = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()
        assert got == n * factor, (t, got, n, factor)
        print(f"{t}: {n} -> {got}")
    nq_src, = con.execute(
        f"SELECT count(*) FROM e WHERE vec_id % 100 = 0 AND vec_id < {max_query_id}"
    ).fetchone()
    nq_dst, = con.execute(
        f"SELECT count(*) FROM '{dst}/embeddings.parquet' "
        f"WHERE vec_id % 100 = 0 AND vec_id < {max_query_id}").fetchone()
    assert nq_dst == nq_src, (
        f"capped query set changed: {nq_src} -> {nq_dst}")
    print(f"capped query set: {nq_src} (unchanged)")


if __name__ == "__main__":
    main()
