#!/usr/bin/env python3
"""Dev tool: synthesize a 10x scale-stress dataset from the driver's
sf0.1 tables (the driver ships no sf1), for the PERFORMANCE curve only —
correctness stays gated on the driver's own scale factors.

Design choices (what makes the curve honest):
- documents: 10 copies, doc_id offset per copy; every copy's word list is
  deterministically SHUFFLED per (doc, copy), so lengths, vocabulary and
  df distribution are preserved but no cross-copy (or within-copy-k>0)
  near-dup pairs are manufactured — the true-pair count stays ~constant
  while the corpus grows 10x, which is exactly the regime where
  candidate-generation superlinearity would show.
- embeddings: 10 copies, vec_id offset, embedding ROLLED by copy index
  (norms and coordinate distribution preserved, no duplicate vectors).
- events: 10 copies, event_id and user_id offset — 10x the users at the
  same per-user density, so windows/sessions scale by key count, not by
  per-key row explosion.
- lineitem/orders: 10 copies with aligned l_orderkey/o_orderkey offsets
  (foreign keys stay valid); o_custkey untouched (10x fan-in per
  customer, the realistic direction).
- region/nation/customer/supplier/part: copied as-is (dimensions).

Usage: python3 tools/gen_sfx.py /root/testdata/sf0.1 /tmp/sfx1 [copies=10]
"""
import pathlib, shutil, sys

import duckdb


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out = pathlib.Path(dst)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads TO 16")
    # Spark reads duckdb's plain TIMESTAMP as TIMESTAMP_NTZ (parquet
    # isAdjustedToUTC=false), which breaks TimestampType-only paths
    # (unix_micros, interval arithmetic vs TZ literals). Write events.ts
    # as TIMESTAMPTZ under a UTC session so Spark sees TimestampType with
    # identical values to the driver's sf0.1 nanos fixture.
    con.sql("SET TimeZone='UTC'")

    def t(name):
        return f"'{src}/{name}.parquet'"

    for dim in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{src}/{dim}.parquet", out / f"{dim}.parquet")
        print(f"copied {dim}")

    kmax = {}
    for key, tbl in [("doc_id", "documents"), ("vec_id", "embeddings"),
                     ("event_id", "events"), ("o_orderkey", "orders")]:
        kmax[tbl] = con.sql(f"SELECT max({key}) + 1 FROM {t(tbl)}").fetchone()[0]
    kmax["user"] = con.sql(f"SELECT max(user_id) + 1 FROM {t('events')}").fetchone()[0]

    # documents: per-copy word shuffle via a keyed sort of the word list.
    # `SELECT * REPLACE` keeps every other column (n_chars — q09c/q09e
    # weighted sampling and the q94 metadata struct need it); the shuffle
    # preserves word multiset, so n_chars stays truthful for every copy.
    con.sql(f"""
      COPY (
        SELECT d.* REPLACE (
          doc_id + k * {kmax['documents']} AS doc_id,
          CASE WHEN k = 0 THEN text ELSE
            list_aggregate(list_transform(
              list_sort(list_transform(
                list_zip(string_split(text, ' '),
                  generate_series(1, len(string_split(text, ' ')))),
                z -> {{'o': hash(z[2] * 2654435761 + doc_id * 40503 + k),
                      'w': z[1]}})),
              p -> p.w), 'string_agg', ' ')
          END AS text)
        FROM {t('documents')} AS d CROSS JOIN generate_series(0, {copies - 1}) AS g(k)
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)""")
    print("documents scaled")

    # `* REPLACE` keeps `label` (q92d centroids / q92e hard negatives).
    con.sql(f"""
      COPY (
        SELECT d.* REPLACE (
          vec_id + k * {kmax['embeddings']} AS vec_id,
          CASE WHEN k = 0 THEN embedding ELSE
            list_concat(embedding[(k % len(embedding)) + 1:],
                        embedding[1:(k % len(embedding))])
          END AS embedding)
        FROM {t('embeddings')} AS d CROSS JOIN generate_series(0, {copies - 1}) AS g(k)
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)""")
    print("embeddings scaled")

    # `* REPLACE` keeps `props` (q65/q65b JSON extraction) and every
    # future column; ts goes out as TIMESTAMPTZ (see session TimeZone).
    con.sql(f"""
      COPY (
        SELECT d.* REPLACE (
          event_id + k * {kmax['events']} AS event_id,
          user_id + k * {kmax['user']} AS user_id,
          CAST(ts AS TIMESTAMPTZ) AS ts)
        FROM {t('events')} AS d CROSS JOIN generate_series(0, {copies - 1}) AS g(k)
      ) TO '{out}/events.parquet' (FORMAT PARQUET)""")
    print("events scaled")

    con.sql(f"""
      COPY (
        SELECT d.* REPLACE (o_orderkey + k * {kmax['orders']} AS o_orderkey)
        FROM {t('orders')} AS d CROSS JOIN generate_series(0, {copies - 1}) AS g(k)
      ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (
        SELECT d.* REPLACE (l_orderkey + k * {kmax['orders']} AS l_orderkey)
        FROM {t('lineitem')} AS d CROSS JOIN generate_series(0, {copies - 1}) AS g(k)
      ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    print("orders/lineitem scaled")


if __name__ == "__main__":
    main()
