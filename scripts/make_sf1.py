"""Generate a 10x scale-up of the driver's sf0.1 testdata for the
scaling sweep (PERF.md): /root/repo/.benchdata/sf1/*.parquet.

Scaling is designed so genuine per-query work grows at most linearly —
the sweep's point is detecting PLAN super-linearity, not data-semantics
blowup:

- events (100k -> 1M): 5 disjoint 32-day time epochs x 2 user banks.
  Pairwise proximity work scales with fleet density per epoch (2x users
  -> 4x candidate pairs for 10x data = sublinear); time-disjoint epochs
  never cross-pair; per-user trip state grows 5x (longer history), not
  10x.
- documents (5k -> 50k): 10 copies; every 5th word in copies k>0 is
  tagged with the copy index, which breaks every 5-gram shingle across
  copies — near-dup/minhash/jaccard candidates stay within-copy
  (linear), while each copy keeps its natural dup structure. doc_id
  offset 1e8 per copy keeps the +1e6 planted-copy id convention of the
  recall oracles collision-free.
- embeddings (2k -> 20k): 10 copies with deterministic ~25% dimension
  sign flips per copy — cosine between copies ~0.5, far below near-dup
  thresholds, so LSH/ANN candidate sets grow linearly.
- lineitem/orders (600k/150k -> 6M/1.5M): 10 key-offset copies over the
  same dimension tables (dims stay broadcast-sized, like TPC-H keeps
  region/nation fixed).
- region/nation/customer/supplier/part: verbatim.

Usage: python scripts/make_sf1.py [out_dir] [K]

K (default 10) is the copy multiplier; K=30 builds the sf3 (30×) point
used by the three-point scaling curve in PERF.md. All offset/tagging
schemes are K-safe up to 96 (the embedding flip-mask modulus).
"""

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ["region", "nation", "customer", "supplier", "part"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )

    union = " UNION ALL ".join(
        f"""SELECT l_orderkey + {k * 100_000_000} AS l_orderkey, l_partkey,
               l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet'"""
        for k in range(K)
    )
    con.execute(f"COPY ({union}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")

    union = " UNION ALL ".join(
        f"""SELECT o_orderkey + {k * 100_000_000} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet'"""
        for k in range(K)
    )
    con.execute(f"COPY ({union}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)")

    union = " UNION ALL ".join(
        f"""SELECT event_id + {k * 10_000_000} AS event_id,
               ts + INTERVAL {(k // 2) * 32} DAYS AS ts,
               user_id + {(k % 2) * 100_000} AS user_id,
               event_type, value, props
            FROM '{SRC}/events.parquet'"""
        for k in range(K)
    )
    con.execute(f"COPY ({union}) TO '{OUT}/events.parquet' (FORMAT PARQUET)")

    parts = []
    for k in range(K):
        if k == 0:
            parts.append(f"SELECT * FROM '{SRC}/documents.parquet'")
        else:
            parts.append(
                f"""SELECT doc_id + {k * 100_000_000} AS doc_id,
                       array_to_string(
                         list_transform(string_split(text, ' '),
                           (w, i) -> CASE WHEN i % 5 = 1
                                          THEN w || 'x{k}' ELSE w END),
                         ' ') AS text,
                       lang, source, 0::BIGINT AS n_chars
                    FROM '{SRC}/documents.parquet'"""
            )
    union = " UNION ALL ".join(parts)
    con.execute(
        f"""COPY (SELECT doc_id, text, lang, source,
                     length(text)::BIGINT AS n_chars
              FROM ({union})) TO '{OUT}/documents.parquet' (FORMAT PARQUET)"""
    )

    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = tbl["vec_id"].to_numpy()
    labels = tbl["label"].to_numpy()
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    out_ids, out_emb, out_lab = [], [], []
    for k in range(K):
        if k == 0:
            flipped = emb
        else:
            # modulus must exceed the flip period: with % 4 both constants
            # reduce to 1 and 3 (mod 4), so the mask collapsed to
            # dim_index % 4 == k % 4 and copies k=1/5/9 etc. were exact
            # byte-identical duplicates, inflating near-dup pair volume in
            # the scaling sweep.  % 97 < 24 flips ~1/4 of dims with a
            # distinct pattern per k (97 prime >> K), keeping inter-copy
            # cosine ~0.5 as designed.
            flips = np.where(
                (np.arange(dim) * 2654435761 + k * 40503) % 97 < 24, -1.0, 1.0
            ).astype(np.float32)
            flipped = emb * flips[None, :]
        out_ids.append(ids + k * 100_000_000)
        out_emb.append(flipped)
        out_lab.append(labels)
    all_emb = np.concatenate(out_emb)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(all_emb.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": arr,
            "label": pa.array(np.concatenate(out_lab), type=pa.int32()),
        }
    )
    pq.write_table(out, f"{OUT}/embeddings.parquet")

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
