"""Dev harness: exact DuckDB mirror of images_dedup_clusters vs the engine.

Builds the full edge set (jaccard>=tau over 5-char shingles, phash hamming<=2
all-pairs, strict-substring containment) over the SAME derived images corpus
(valid rows only), runs recursive-CTE connected components, and compares the
cluster-size histogram and the pair sets with the engine's dedup_pipeline.
"""
from __future__ import annotations

import sys

import duckdb

_NORM = "regexp_replace(trim(lower({c})), '\\s+', ' ', 'g')"

ORACLE_EDGES = f"""
WITH base AS (
  SELECT doc_id, printf('img%012d', doc_id) AS image_id, text AS caption
  FROM documents),
imgs AS (
  SELECT image_id AS id, caption FROM base
  UNION ALL
  SELECT 'img9' || substr(image_id, 5, 11), caption FROM base WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'img8' || substr(image_id, 5, 11),
         substr(caption, strpos(caption, ' ') + 1)
  FROM base WHERE doc_id % 5 = 0),
norm AS (SELECT id, {_NORM.format(c='caption')} AS txt FROM imgs),
sh AS (
  SELECT id, unnest(list_distinct(
           CASE WHEN length(txt) <= 5 THEN [txt]
                ELSE [substr(txt, i, 5) for i in range(1, length(txt) - 3)] END)) AS g
  FROM norm),
sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS u, b.id AS v, count(*) AS i
  FROM sh a JOIN sh b USING (g) WHERE a.id < b.id GROUP BY 1, 2),
jac AS (
  SELECT u, v FROM inter
  JOIN sizes sa ON sa.id = u JOIN sizes sb ON sb.id = v
  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7),
ph AS (
  SELECT id, ph FROM (
    SELECT printf('img%012d', doc_id) AS id,
           ('0x' || substr(md5(text), 1, 15))::BIGINT AS ph FROM documents
    UNION ALL
    SELECT 'img9' || printf('%011d', doc_id % 100000000000),
           ('0x' || substr(md5(text), 1, 15))::BIGINT FROM documents WHERE doc_id % 7 = 0
    UNION ALL
    SELECT 'img8' || printf('%011d', doc_id % 100000000000),
           ('0x' || substr(md5(text), 1, 15))::BIGINT + 1 FROM documents WHERE doc_id % 5 = 0)),
php AS (
  SELECT a.id AS u, b.id AS v FROM ph a JOIN ph b
    ON a.id < b.id AND bit_count(xor(a.ph, b.ph)) <= 2),
normf AS (SELECT id, txt FROM norm WHERE length(txt) >= 16),
cont AS (
  SELECT least(a.id, b.id) AS u, greatest(a.id, b.id) AS v
  FROM normf a JOIN normf b
    ON a.id != b.id AND length(a.txt) < length(b.txt)
  WHERE strpos(b.txt, a.txt) > 0),
edges AS (SELECT u, v FROM jac UNION SELECT u, v FROM php UNION SELECT u, v FROM cont)
SELECT u, v FROM edges
"""

ORACLE_HIST = f"""
WITH RECURSIVE e AS ({ORACLE_EDGES}),
nodes AS (
  SELECT printf('img%012d', doc_id) AS id FROM documents
  UNION ALL
  SELECT 'img9' || printf('%011d', doc_id % 100000000000) FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT 'img8' || printf('%011d', doc_id % 100000000000) FROM documents WHERE doc_id % 5 = 0),
sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
reach AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v != r.u),
comp AS (
  SELECT n.id, least(n.id, coalesce(min(r.v), n.id)) AS component
  FROM nodes n LEFT JOIN reach r ON r.u = n.id
  GROUP BY n.id),
csize AS (SELECT component, count(*) AS n_members FROM comp GROUP BY 1)
SELECT n_members, count(*) AS n_clusters FROM csize GROUP BY 1 ORDER BY 1
"""


def main(sf_dir: str) -> None:
    from pyspark.sql import functions as F
    from jsonschema_jl_spark.session import get_spark
    from jsonschema_jl_spark.datagen.from_documents import images_from_documents
    from jsonschema_jl_spark.operators.pipeline import dedup_pipeline
    from jsonschema_jl_spark.config import DedupConfig

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    o_hist = con.execute(ORACLE_HIST).fetchall()
    o_edges = {tuple(r) for r in con.execute(ORACLE_EDGES).fetchall()}

    spark = get_spark(cores=8, extra_conf={"spark.driver.memory": "8g"})
    images = images_from_documents(spark, sf_dir)
    res = dedup_pipeline(images, DedupConfig())
    e_hist = [
        (r.n_members, r.n_clusters)
        for r in res.labels.groupBy("component")
        .agg(F.count("*").alias("n_members"))
        .groupBy("n_members")
        .agg(F.count("*").alias("n_clusters"))
        .orderBy("n_members")
        .collect()
    ]
    # map engine nid edges back to image ids for pair-level diff
    idmap = {r.nid: r.image_id for r in res.signatures.select("nid", "image_id").collect()}
    e_edges = set()
    for r in res.edges.select("src", "dst").collect():
        a, b = idmap[r.src], idmap[r.dst]
        e_edges.add((min(a, b), max(a, b)))

    print("oracle hist:", o_hist)
    print("engine hist:", e_hist)
    print("hist match:", o_hist == e_hist)
    print("edges oracle:", len(o_edges), "engine:", len(e_edges))
    print("oracle-only:", sorted(o_edges - e_edges)[:10])
    print("engine-only:", sorted(e_edges - o_edges)[:10])
    res.cleanup()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
