#!/usr/bin/env python3
"""Scale a testdata corpus by replicating it FACTOR times with consistent
key shifts (referential integrity preserved: lineitem -> orders ->
customer, lineitem -> part/supplier). Schema-preserving via pyarrow, so
Spark-facing physical types (events' TIMESTAMP(NANOS), float embedding
lists) survive.

Usage: python3 scripts/gen_sf_scale.py <srcDir> <dstDir> <factor>

Content perturbation keeps the scaled corpus honest for dedup/similarity:
  - documents: every 10th word (offset by copy) is replaced with a
    copy-specific token, so within-copy shingle sharing matches the
    source corpus while cross-copy documents stay near-but-not-exact
    duplicates;
  - embeddings: copy i adds i*1e-3 to the first component — cross-copy
    vectors become near-duplicates (cosine ~0.9999), exercising the
    near-dup paths that are empty on the source corpus.

Dev-only tool (driver-side python); not part of the shipped library.
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc


def shift_col(tbl, col, shift):
    i = tbl.schema.get_field_index(col)
    shifted = pc.add(tbl.column(col), pa.scalar(shift, type=tbl.schema.field(col).type))
    return tbl.set_column(i, tbl.schema.field(col), shifted)


def replace_col(tbl, col, values):
    i = tbl.schema.get_field_index(col)
    arr = pa.array(values, type=tbl.schema.field(col).type)
    return tbl.set_column(i, tbl.schema.field(col), arr)


def perturb_text(texts, copy):
    out = []
    for t in texts:
        words = t.split(" ")
        for p in range(copy - 1, len(words), 10):
            words[p] = f"z{copy}"
        out.append(" ".join(words))
    return out


def main(src, dst, factor):
    import os

    os.makedirs(dst, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet")
              for t in ["region", "nation", "customer", "supplier", "part",
                        "orders", "lineitem", "events", "documents", "embeddings"]}
    mx = {
        "cust": pc.max(tables["customer"]["c_custkey"]).as_py() + 1,
        "supp": pc.max(tables["supplier"]["s_suppkey"]).as_py() + 1,
        "part": pc.max(tables["part"]["p_partkey"]).as_py() + 1,
        "ord": pc.max(tables["orders"]["o_orderkey"]).as_py() + 1,
        "ev": pc.max(tables["events"]["event_id"]).as_py() + 1,
        "doc": pc.max(tables["documents"]["doc_id"]).as_py() + 1,
        "vec": pc.max(tables["embeddings"]["vec_id"]).as_py() + 1,
    }

    def copies(name, fn):
        parts = [fn(tables[name], i) for i in range(factor)]
        merged = pa.concat_tables(parts)
        pq.write_table(merged, f"{dst}/{name}.parquet")
        print(f"{name}: {tables[name].num_rows} -> {merged.num_rows}")

    # fixed dims: do not scale (regions/nations are enumerations)
    for t in ["region", "nation"]:
        pq.write_table(tables[t], f"{dst}/{t}.parquet")
        print(f"{t}: copied")

    copies("customer", lambda t, i: shift_col(t, "c_custkey", i * mx["cust"]))
    copies("supplier", lambda t, i: shift_col(t, "s_suppkey", i * mx["supp"]))
    copies("part", lambda t, i: shift_col(t, "p_partkey", i * mx["part"]))
    copies("orders", lambda t, i: shift_col(
        shift_col(t, "o_orderkey", i * mx["ord"]), "o_custkey", i * mx["cust"]))
    copies("lineitem", lambda t, i: shift_col(shift_col(shift_col(
        t, "l_orderkey", i * mx["ord"]), "l_partkey", i * mx["part"]),
        "l_suppkey", i * mx["supp"]))
    # user_id stays: scale means more events per user, not more users
    copies("events", lambda t, i: shift_col(t, "event_id", i * mx["ev"]))

    def docs(t, i):
        t = shift_col(t, "doc_id", i * mx["doc"])
        if i == 0:
            return t
        texts = perturb_text(t.column("text").to_pylist(), i)
        t = replace_col(t, "text", texts)
        return replace_col(t, "n_chars", [len(x) for x in texts])

    copies("documents", docs)

    def embs(t, i):
        t = shift_col(t, "vec_id", i * mx["vec"])
        if i == 0:
            return t
        vecs = t.column("embedding").to_pylist()
        for v in vecs:
            if v:
                v[0] = v[0] + i * 1e-3
        return replace_col(t, "embedding", vecs)

    copies("embeddings", embs)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
