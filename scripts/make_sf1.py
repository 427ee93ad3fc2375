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

Usage: python scripts/make_sf1.py [out_dir] [K] [mode]

K (default 10) is the copy multiplier; K=30 builds the sf3 (30×) point
used by the three-point scaling curve in PERF.md. All offset/tagging
schemes are K-safe up to 96 (the embedding flip-mask modulus).

mode (default "tag") selects the document scaling scheme:

- "tag": the original every-5th-word copy tag. Cheap and guarantees
  copies never near-dup each other, but INFLATES THE TOKEN DOMAIN ×K
  (each word gains per-copy variants), which is what drove the
  super-unit sweep tails of the vocabulary-bounded operators
  (doc_lm_score bigram domain, doc_heavy_ngrams support dilution,
  doc_pmi_bigrams margins).
- "natural": vocabulary-preserving segment mutation — copy k of a doc
  replaces a deterministic subset of word positions with OTHER WORDS
  FROM THE BANK-0 VOCABULARY. Regular docs mutate ~40% of positions
  (5-gram survival 0.6^5 ≈ 8%, Jaccard vs the original ~4% — far below
  every near-dup threshold, so cross-copy candidates stay out), while
  ~2% of (doc, copy) slots are planted true near-copies at ~0.5%
  mutation (cluster size ~2-3 independent of K — the thin genuine
  near-dup stream a web crawl carries). The token domain stays EXACTLY
  bank-0's, so vocabulary-bounded operators scale on data volume, not
  on a generator artifact.
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
MODE = sys.argv[3] if len(sys.argv) > 3 else "tag"


def natural_documents(out_path: str) -> None:
    """Write K copy banks of documents with vocabulary-preserving
    deterministic mutations (see module docstring, mode="natural")."""
    tbl = pq.read_table(f"{SRC}/documents.parquet")
    doc_ids = tbl["doc_id"].to_numpy()
    texts = tbl["text"].to_pylist()
    langs = tbl["lang"].to_pylist()
    sources = tbl["source"].to_pylist()

    tok_lists = [t.split(" ") for t in texts]
    lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = np.array(
        [w for toks in tok_lists for w in toks], dtype=object
    )
    starts = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    vocab, inv = np.unique(flat, return_inverse=True)
    V = len(vocab)
    # per-token deterministic hash base: global position + owning doc
    pos = np.arange(len(flat), dtype=np.uint64)
    doc_of = np.repeat(doc_ids.astype(np.uint64), lens)

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    writer = pq.ParquetWriter(out_path, schema)
    A = np.uint64(2654435761)
    B = np.uint64(1013904223)
    for k in range(K):
        if k == 0:
            out_texts = texts
            out_doc_ids = doc_ids
        else:
            ku = np.uint64(k)
            # ~2% of (doc, copy) slots are planted true near-copies
            planted = (doc_ids.astype(np.uint64) * A + ku * B) % np.uint64(
                50
            ) == 0
            rate = np.where(np.repeat(planted, lens), 5, 400).astype(
                np.uint64
            )  # per-mille mutation rates: 0.5% planted (5-gram
            # Jaccard ~0.95, above the 0.9 near-dup threshold), 40%
            # regular (Jaccard ~0.04, far below every threshold)
            h = pos * A + doc_of * np.uint64(97) + ku * np.uint64(40503)
            mutate = (h % np.uint64(1000)) < rate
            sub = ((h >> np.uint64(10)) * A + pos) % np.uint64(V)
            new_inv = np.where(mutate, sub.astype(np.int64), inv)
            words = vocab[new_inv]
            out_texts = [
                " ".join(words[starts[i] : starts[i + 1]])
                for i in range(len(lens))
            ]
            out_doc_ids = doc_ids + k * 100_000_000
        writer.write_table(
            pa.table(
                {
                    "doc_id": pa.array(out_doc_ids, type=pa.int64()),
                    "text": pa.array(out_texts, type=pa.string()),
                    "lang": pa.array(langs, type=pa.string()),
                    "source": pa.array(sources, type=pa.string()),
                    "n_chars": pa.array(
                        [len(t) for t in out_texts], type=pa.int64()
                    ),
                },
                schema=schema,
            )
        )
    writer.close()


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

    if MODE == "natural":
        natural_documents(f"{OUT}/documents.parquet")
        write_embeddings()
        report(con)
        return

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

    write_embeddings()
    report(con)


def write_embeddings() -> None:
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


def report(con) -> None:
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = con.execute(f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
