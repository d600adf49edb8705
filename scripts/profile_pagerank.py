"""Profiling bed for the PageRank inner loop (scaling-efficiency work).

Builds the scaling-bench edge table once into /dev/shm/prof_edges
(200k pages, outlinks 8, 16 disjoint replicas — same as
scripts/scaling_bench.py defaults), then times PageRank variants
per-iteration at the requested core count.

Usage: python scripts/profile_pagerank.py <cores> <variant> [n_iter]
  variant ∈ {current, fused, floor}
"""

from __future__ import annotations

import os
import sys
import time


def _cpu_snap():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = list(map(int, parts))
    idle = vals[3] + vals[4]
    return sum(vals), idle


def cpu_util(prev, cur):
    dt = cur[0] - prev[0]
    didle = cur[1] - prev[1]
    return 100.0 * (dt - didle) / max(dt, 1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from communitydetection_jl_spark.session import get_spark

REPLICAS = int(os.environ.get("PROF_REPLICAS", "16"))
EDGES_PATH = f"/dev/shm/prof_edges_r{REPLICAS}"


def build_edges(spark, cpus):
    from communitydetection_jl_spark.sources.pages import (
        extract_edges, latest_captures, restrict_to_corpus, synth_pages, url_dim,
    )
    pages = synth_pages(spark, n_pages=200_000, n_hosts=2000, avg_outlinks=8)
    dim = url_dim(latest_captures(pages))
    e = restrict_to_corpus(extract_edges(pages), dim)
    e = e.localCheckpoint(eager=True)
    base = e.select(
        F.pmod(F.col("src"), F.lit(1 << 40)).alias("src"),
        F.pmod(F.col("dst"), F.lit(1 << 40)).alias("dst"),
        "weight",
    )
    copies = [
        base.select(
            (F.col("src") + F.lit(k << 44)).alias("src"),
            (F.col("dst") + F.lit(k << 44)).alias("dst"),
            "weight",
        )
        for k in range(REPLICAS)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.write.mode("overwrite").parquet(EDGES_PATH)


def run_current(spark, edges, n_iter):
    from communitydetection_jl_spark.operators.pagerank import pagerank
    t0 = time.time()
    res = pagerank(edges, tol=0.0, max_iter=n_iter)
    dt = time.time() - t0
    print(f"current: {n_iter} iters in {dt:.1f}s -> {dt/n_iter:.2f}s/iter")


def run_floor(spark, edges, n_iter):
    """Lower bound: the irreducible per-iteration shuffle (join + agg)."""
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    m = arcs.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    ranks = verts.select("id", F.lit(1.0).alias("p")).repartition("id").persist()
    n = ranks.count()
    print(f"floor: m={m} n={n}")
    for i in range(n_iter):
        t0 = time.time()
        msgs = (
            arcs.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        c = msgs.count()
        print(f"  floor iter {i}: {time.time()-t0:.2f}s ({c} rows)")


def run_fused1(spark, edges, n_iter):
    """One action/iter + lineage truncation EVERY iter (lazy checkpoint).

    Per iteration: plan → lazy localCheckpoint → persist → single agg
    (delta + next dangling mass) which materializes checkpoint+cache.
    """
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    t_all = time.time()
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    m = arcs.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    damping = 0.85
    src_ids = edges.select(F.col("src").alias("id")).distinct()
    state = (
        verts.join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.col("_h").isNull().alias("dang"))
        .repartition("id")
    )
    tau = 1.0 - damping
    state = state.select("id", F.lit(0.0).alias("p"), "dang")
    state = state.localCheckpoint(eager=True).persist()
    n_ = state.count()
    state = state.select("id", F.lit(1.0 / n_).alias("p"), "dang")
    r = state.agg(F.sum(F.when(F.col("dang"), F.lit(1.0 / n_)))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    print(f"fused1: m={m} n={n_} setup={time.time()-t_all:.1f}s")
    prev = state
    t_loop = time.time()
    for i in range(n_iter):
        t0 = time.time()
        c0 = _cpu_snap()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
        )
        if i == 2 and os.environ.get("PROF_EXPLAIN"):
            new_state.explain("formatted")
        new_state = new_state.localCheckpoint(eager=False)
        if not os.environ.get("PROF_NOPERSIST"):
            new_state = new_state.persist()
        row = new_state.agg(
            F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
            F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
        ).collect()[0]
        delta = float(row["delta"] or 0.0)
        dang_mass = float(row["dm"] or 0.0)
        if i == 2 and os.environ.get("PROF_EXPLAIN"):
            print(new_state._sc._jvm.PythonSQLUtils.explainString(
                new_state._jdf.queryExecution(), "formatted"))
        prev.unpersist()
        prev = new_state
        state = new_state.select("id", "p", "dang")
        print(f"  fused1 iter {i}: {time.time()-t0:.2f}s delta={delta:.2e} "
              f"cpu={cpu_util(c0, _cpu_snap()):.0f}%")
    dt = time.time() - t_loop
    print(f"fused1 loop: {dt:.1f}s for {n_iter} iters -> {dt/n_iter:.2f}s/iter")


def run_pq(spark, edges, n_iter):
    """State round-trips through parquet in /dev/shm each iteration.

    job 1: write new state parquet (the superstep compute);
    job 2: scalar agg over the freshly-read parquet (columnar scan).
    No localCheckpoint / persist of state at all — zero long-lived JVM
    objects per iteration, perfect lineage truncation, real file stats,
    and the parquet IS the resume snapshot.
    """
    import shutil
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    t_all = time.time()
    ckdir = "/dev/shm/pq_state"
    shutil.rmtree(ckdir, ignore_errors=True)
    os.makedirs(ckdir)
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    m = arcs.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    damping = 0.85
    src_ids = edges.select(F.col("src").alias("id")).distinct()
    state0 = (
        verts.join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.col("_h").isNull().alias("dang"))
        .repartition("id")
    )
    n_ = None
    state0.select("id", F.lit(0.0).alias("p"), F.lit(0.0).alias("p_old"),
                  "dang").write.mode("overwrite").parquet(f"{ckdir}/it0")
    st = spark.read.parquet(f"{ckdir}/it0")
    n_ = st.count()
    tau = 1.0 - damping
    state = st.select("id", F.lit(1.0 / n_).alias("p"), "dang")
    r = state.agg(F.sum(F.when(F.col("dang"), F.lit(1.0 / n_)))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    print(f"pq: m={m} n={n_} setup={time.time()-t_all:.1f}s")
    t_loop = time.time()
    for i in range(n_iter):
        t0 = time.time()
        c0 = _cpu_snap()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
        )
        path = f"{ckdir}/it{i+1}"
        new_state.write.mode("overwrite").parquet(path)
        t_w = time.time() - t0
        st = spark.read.parquet(path)
        row = st.agg(
            F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
            F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
        ).collect()[0]
        delta = float(row["delta"] or 0.0)
        dang_mass = float(row["dm"] or 0.0)
        state = st.select("id", "p", "dang")
        shutil.rmtree(f"{ckdir}/it{i-1}", ignore_errors=True)
        print(f"  pq iter {i}: {time.time()-t0:.2f}s (write {t_w:.2f}s) "
              f"delta={delta:.2e} cpu={cpu_util(c0, _cpu_snap()):.0f}%")
    dt = time.time() - t_loop
    print(f"pq loop: {dt:.1f}s for {n_iter} iters -> {dt/n_iter:.2f}s/iter")


def run_pq2(spark, edges, n_iter):
    """pq + serial-overhead elimination: ONE job/iter via observe()
    metrics fused into the parquet write; committer v2; no _SUCCESS; no
    compression; AQE off inside the loop (partitioning is explicit)."""
    import shutil
    from pyspark.sql import Observation
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    t_all = time.time()
    ckdir = "/dev/shm/pq_state"
    shutil.rmtree(ckdir, ignore_errors=True)
    os.makedirs(ckdir)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    hc.set("parquet.summary.metadata.level", "NONE")
    spark.conf.set("spark.sql.parquet.compression.codec", "none")
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    m = arcs.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    damping = 0.85
    src_ids = edges.select(F.col("src").alias("id")).distinct()
    state0 = (
        verts.join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.col("_h").isNull().alias("dang"))
        .repartition("id")
    )
    state0.select("id", F.lit(0.0).alias("p"), "dang").write.mode(
        "overwrite").parquet(f"{ckdir}/it0")
    st = spark.read.parquet(f"{ckdir}/it0")
    n_ = st.count()
    tau = 1.0 - damping
    state = st.select("id", F.lit(1.0 / n_).alias("p"), "dang")
    r = state.agg(F.sum(F.when(F.col("dang"), F.lit(1.0 / n_)))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    print(f"pq2: m={m} n={n_} setup={time.time()-t_all:.1f}s")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_loop = time.time()
    for i in range(n_iter):
        t0 = time.time()
        c0 = _cpu_snap()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        obs = Observation(f"pr_{i}")
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
                F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
            )
            .select("id", "p", "dang")
        )
        path = f"{ckdir}/it{i+1}"
        new_state.write.mode("overwrite").parquet(path)
        got = obs.get
        delta = float(got["delta"] or 0.0)
        dang_mass = float(got["dm"] or 0.0)
        state = spark.read.parquet(path)
        shutil.rmtree(f"{ckdir}/it{i-1}", ignore_errors=True)
        print(f"  pq2 iter {i}: {time.time()-t0:.2f}s "
              f"delta={delta:.2e} cpu={cpu_util(c0, _cpu_snap()):.0f}%")
    dt = time.time() - t_loop
    print(f"pq2 loop: {dt:.1f}s for {n_iter} iters -> {dt/n_iter:.2f}s/iter")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def _dense_ids(verts):
    """Scalable dense-rank: range-partition, per-partition row_number +
    broadcast offsets. Returns (id, nid:int)."""
    from pyspark.sql import Window as W
    spark = verts.sparkSession
    P = verts.sparkSession.sparkContext.defaultParallelism
    # materialize ONCE: repartitionByRange re-samples boundaries on every
    # execution, so offsets and row_numbers must read the same instance
    d = (
        verts.repartitionByRange(P, "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = d.groupBy("_pid").count().collect()
    offs = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += r["count"]
    omap = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
    w = W.partitionBy("_pid").orderBy("id")
    return d.select(
        "id",
        (F.row_number().over(w) - 1 + omap[F.col("_pid")]).cast("int").alias("nid"),
    )


def run_pq3(spark, edges, n_iter):
    """pq2 + dense int32 vertex ids + float32 trans_prob: ~2x narrower
    rows -> less memory bandwidth per edge (the single-box scaling
    ceiling), narrower shuffles at any scale."""
    import shutil
    from pyspark.sql import Observation
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    t_all = time.time()
    ckdir = "/dev/shm/pq_state"
    shutil.rmtree(ckdir, ignore_errors=True)
    os.makedirs(ckdir)
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    hc.set("parquet.summary.metadata.level", "NONE")
    spark.conf.set("spark.sql.parquet.compression.codec", "none")
    cpus = spark.sparkContext.defaultParallelism
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    dim = _dense_ids(verts).persist()
    n_ = dim.count()
    e2 = (
        edges.join(dim.select(F.col("id").alias("src"), F.col("nid").alias("s")), "src")
        .join(dim.select(F.col("id").alias("dst"), F.col("nid").alias("d")), "dst")
        .select(F.col("s").alias("src"), F.col("d").alias("dst"), "weight")
    )
    arcs = (
        trans_prob_directed(e2)
        .select("src", "dst", F.col("trans_prob").cast("float").alias("tp"))
        .repartition(cpus, "src")
        .persist()
    )
    m = arcs.count()
    damping = 0.85
    src_ids = e2.select(F.col("src").alias("id")).distinct()
    state0 = (
        dim.select(F.col("nid").alias("id"))
        .join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.col("_h").isNull().alias("dang"))
        .repartition(cpus, "id")
    )
    state0.select("id", F.lit(0.0).alias("p"), "dang").write.mode(
        "overwrite").parquet(f"{ckdir}/it0")
    sch = "id int, p double, dang boolean"
    st = spark.read.schema(sch).parquet(f"{ckdir}/it0")
    tau = 1.0 - damping
    state = st.select("id", F.lit(1.0 / n_).alias("p"), "dang")
    r = state.agg(F.sum(F.when(F.col("dang"), F.lit(1.0 / n_)))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    print(f"pq3: m={m} n={n_} setup={time.time()-t_all:.1f}s")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_loop = time.time()
    for i in range(n_iter):
        t0 = time.time()
        c0 = _cpu_snap()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("tp") * F.col("p")).alias("msg"))
        )
        obs = Observation(f"pr_{i}")
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
                F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
            )
            .select("id", "p", "dang")
        )
        path = f"{ckdir}/it{i+1}"
        new_state.write.mode("overwrite").parquet(path)
        got = obs.get
        delta = float(got["delta"] or 0.0)
        dang_mass = float(got["dm"] or 0.0)
        state = spark.read.schema(sch).parquet(path)
        shutil.rmtree(f"{ckdir}/it{i-1}", ignore_errors=True)
        print(f"  pq3 iter {i}: {time.time()-t0:.2f}s "
              f"delta={delta:.2e} cpu={cpu_util(c0, _cpu_snap()):.0f}%")
    dt = time.time() - t_loop
    print(f"pq3 loop: {dt:.1f}s for {n_iter} iters -> {dt/n_iter:.2f}s/iter")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def run_pq4(spark, edges, n_iter):
    """pq3 + bucketed state & arcs tables: both joins bucket-aligned
    (zero exchange on the big sides), one narrow shuffle per iteration
    (the msgs groupBy). Two stages per superstep."""
    import shutil
    from pyspark.sql import Observation
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    t_all = time.time()
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    hc.set("parquet.summary.metadata.level", "NONE")
    spark.conf.set("spark.sql.parquet.compression.codec", "none")
    cpus = spark.sparkContext.defaultParallelism
    P = cpus
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    dim = _dense_ids(verts).persist()
    n_ = dim.count()
    e2 = (
        edges.join(dim.select(F.col("id").alias("src"), F.col("nid").alias("s")), "src")
        .join(dim.select(F.col("id").alias("dst"), F.col("nid").alias("d")), "dst")
        .select(F.col("s").alias("src"), F.col("d").alias("dst"), "weight")
    )
    for t in ("pr_arcs", "pr_state_a", "pr_state_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/dev/shm/wh/{t}", ignore_errors=True)
    (
        trans_prob_directed(e2)
        .select("src", "dst", F.col("trans_prob").cast("float").alias("tp"))
        .repartition(P, "src")
        .write.bucketBy(P, "src").sortBy("src")
        .mode("overwrite").saveAsTable("pr_arcs")
    )
    arcs = spark.table("pr_arcs")
    m = arcs.count()
    damping = 0.85
    src_ids = e2.select(F.col("src").alias("id")).distinct()
    state0 = (
        dim.select(F.col("nid").alias("id"))
        .join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.lit(1.0 / 2).alias("p"), F.col("_h").isNull().alias("dang"))
        .repartition(P, "id")
    )
    state0.select("id", F.lit(1.0).alias("p"), "dang").write.bucketBy(
        P, "id").mode("overwrite").saveAsTable("pr_state_a")
    st = spark.table("pr_state_a")
    tau = 1.0 - damping
    state = st.select("id", F.lit(1.0 / n_).alias("p"), "dang")
    r = state.agg(F.sum(F.when(F.col("dang"), F.lit(1.0 / n_)))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    print(f"pq4: m={m} n={n_} setup={time.time()-t_all:.1f}s")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t_loop = time.time()
    cur, nxt = "pr_state_a", "pr_state_b"
    for i in range(n_iter):
        t0 = time.time()
        c0 = _cpu_snap()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("tp") * F.col("p")).alias("msg"))
        )
        obs = Observation(f"pr_{i}")
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
            .observe(
                obs,
                F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
                F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
            )
            .select("id", "p", "dang")
        )
        spark.sql(f"DROP TABLE IF EXISTS {nxt}")
        new_state.write.bucketBy(P, "id").mode("overwrite").saveAsTable(nxt)
        got = obs.get
        delta = float(got["delta"] or 0.0)
        dang_mass = float(got["dm"] or 0.0)
        state = spark.table(nxt)
        cur, nxt = nxt, cur
        if i == 2 and os.environ.get("PROF_EXPLAIN"):
            state.sparkSession.table(cur)  # no-op
        print(f"  pq4 iter {i}: {time.time()-t0:.2f}s "
              f"delta={delta:.2e} cpu={cpu_util(c0, _cpu_snap()):.0f}%")
    dt = time.time() - t_loop
    print(f"pq4 loop: {dt:.1f}s for {n_iter} iters -> {dt/n_iter:.2f}s/iter")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def run_fused(spark, edges, n_iter):
    """Candidate redesign: ONE action per iteration.

    State carries (id, p, p_old, dang). The convergence delta and the
    NEXT iteration's dangling mass come from a single agg over the
    just-persisted state (the agg is the action that populates the
    cache). Dangling mass enters the plan as a literal — no broadcast
    job, no semi-join. Lineage truncated every TRUNC iterations.
    """
    from communitydetection_jl_spark.operators.degrees import trans_prob_directed
    TRUNC = 8
    t_all = time.time()
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    m = arcs.count()
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    damping, n_ = 0.85, None
    src_ids = edges.select(F.col("src").alias("id")).distinct()
    state = (
        verts.join(src_ids.withColumn("_h", F.lit(1)), "id", "left")
        .select("id", F.col("_h").isNull().alias("dang"))
        .repartition("id")
        .persist()
    )
    n_ = state.count()
    row = state.agg(F.sum(F.col("dang").cast("long"))).collect()[0]
    print(f"fused: m={m} n={n_} dangling={row[0]}  setup={time.time()-t_all:.1f}s")
    tau = 1.0 - damping
    state = state.select("id", F.lit(1.0 / n_).alias("p"), "dang").persist()
    dang_mass = None  # computed from the first agg
    # prime: one agg to get initial dangling mass
    r = state.agg(F.sum(F.when(F.col("dang"), F.col("p")))).collect()[0]
    dang_mass = float(r[0] or 0.0)
    prev = state
    for i in range(n_iter):
        t0 = time.time()
        msgs = (
            arcs.join(state.select(F.col("id").alias("src"), "p"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        new_state = (
            state.select("id", F.col("p").alias("p_old"), "dang")
            .join(msgs, "id", "left")
            .select(
                "id",
                (
                    F.lit(tau / n_ + damping * dang_mass / n_)
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
                "dang",
            )
        )
        if (i + 1) % TRUNC == 0:
            new_state = new_state.localCheckpoint(eager=False)
        new_state = new_state.persist()
        row = new_state.agg(
            F.sum(F.abs(F.col("p") - F.col("p_old"))).alias("delta"),
            F.sum(F.when(F.col("dang"), F.col("p"))).alias("dm"),
        ).collect()[0]
        delta = float(row["delta"] or 0.0)
        dang_mass = float(row["dm"] or 0.0)
        prev.unpersist()
        prev = new_state
        state = new_state.select("id", "p", "dang")
        print(f"  fused iter {i}: {time.time()-t0:.2f}s delta={delta:.2e}")
    print(f"fused total: {time.time()-t_all:.1f}s for {n_iter} iters")


def main():
    cores = int(sys.argv[1])
    variant = sys.argv[2]
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    extra = {}
    if os.environ.get("PROF_SHJ"):
        extra["spark.sql.join.preferSortMergeJoin"] = "false"
    jopts = []
    if os.environ.get("PROF_GC_LOG"):
        jopts.append("-Xlog:gc*:file=/tmp/gc.log:time,uptime")
    if os.environ.get("PROF_GC") == "parallel":
        jopts.append("-XX:+UseParallelGC")
    if jopts:
        extra["spark.driver.extraJavaOptions"] = " ".join(jopts)
    extra["spark.sql.warehouse.dir"] = "/dev/shm/wh"
    spark = get_spark("pr-profile", cores=cores, shuffle_partitions=cores,
                      extra_conf=extra)
    if not os.path.exists(EDGES_PATH):
        t0 = time.time()
        build_edges(spark, cores)
        print(f"built edges in {time.time()-t0:.1f}s")
    edges = spark.read.parquet(EDGES_PATH).repartition(cores, "src").localCheckpoint(eager=True)
    print(f"edges: {edges.count()}")
    {"current": run_current, "fused": run_fused, "fused1": run_fused1,
     "floor": run_floor, "pq": run_pq, "pq2": run_pq2, "pq3": run_pq3,
     "pq4": run_pq4}[variant](
        spark, edges, n_iter
    )


if __name__ == "__main__":
    main()
