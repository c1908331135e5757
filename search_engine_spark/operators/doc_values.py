"""Doc-values sidecar: per-document field columns for serving-side aggs.

The reference keeps every document in process memory (``idx.documents``,
SearchEngine.ts:241), so its aggregations are in-memory loops over field
values. The Spark-native equivalent of that RAM doc store is a compact
columnar sidecar next to the block index: ``doc_values/`` holds ONLY the
agg-able scalar columns (keyword / numeric / bool / timestamp — never the
indexed text bodies or binaries), doc_id-sorted so a serving node gathers
matched docs' values with one searchsorted per query.

Scale story: at 100 TB of text the scalar metadata columns are a few GB —
the sidecar is range-partitioned by doc_id, so a sharded serving tier maps
id ranges to nodes and each loads only its slice; the writer is one
repartitionByRange (the only shuffle) over a column-pruned scan.

Timestamps are stored as epoch MILLIS (long) — exactly
``unix_millis(cast(col as timestamp))`` — so the serving twin buckets
date_histograms with the same integer arithmetic as the Spark path
(agg_compile._date_histogram) regardless of session timezone.

Staleness: the sidecar stamps the LSM run lineage it was built over
(``includes_runs``, same convention as blocks_meta — wand.write_blocks);
readers compare against lsm.accounted_runs and treat a stale sidecar as
absent (aggregations fall back to the Spark path) rather than undercount.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_VALUES = "doc_values"
DV_META = "doc_values_meta.json"


def _index_delete_epoch(index_dir: str) -> int:
    """Current delete epoch from the index meta (0 when unset) —
    compact_deletes bumps it after physically purging rows."""
    mp = os.path.join(index_dir, "meta.json")
    if not os.path.isfile(mp):
        return 0
    with open(mp) as fh:
        return int(json.load(fh).get("delete_epoch", 0))


def _index_resolve_state(index_dir: str) -> tuple:
    """(resolve_epoch, resolve_events) from the index meta —
    lsm.compact_runs bumps the epoch whenever it resolves upsert
    tombstones and records the purged (doc_id -> barrier) pairs."""
    mp = os.path.join(index_dir, "meta.json")
    if not os.path.isfile(mp):
        return 0, []
    with open(mp) as fh:
        m = json.load(fh)
    return int(m.get("resolve_epoch", 0)), list(m.get("resolve_events", []))

#: spark simpleString prefixes we can serve aggregations over
_SERVABLE_TYPES = ("string", "boolean", "tinyint", "smallint", "int",
                   "bigint", "float", "double", "decimal", "date",
                   "timestamp")


def servable_fields(docs: DataFrame, id_col: str,
                    exclude: tuple = ()) -> list:
    """Scalar columns worth carrying in the sidecar — every servable-typed
    top-level column except the id and the indexed text bodies (callers
    pass the text-typed columns of IndexConfig.fields via ``exclude``;
    keyword/email/url/phone columns stay — they're the terms-agg fields).
    One-level STRUCT scalar leaves ride along as dotted names
    ('location.lat') so serving can answer geo_distance / struct-field
    range / exists and struct-leaf terms aggs; deeper nesting, arrays, and
    binaries stay Spark-side."""
    out = []
    for f in docs.schema.fields:
        name, dtype = f.name, f.dataType.simpleString()
        if name == id_col or name in exclude:
            continue
        if dtype.startswith(_SERVABLE_TYPES):
            out.append(name)
        elif dtype.startswith("struct"):
            for leaf in f.dataType.fields:
                if leaf.dataType.simpleString().startswith(_SERVABLE_TYPES):
                    out.append(f"{name}.{leaf.name}")
    return out


def field_types(docs: DataFrame, fields: list) -> dict:
    """{field: spark dtype simpleString} resolving one-level dotted
    struct-leaf names against the schema."""
    flat = {f.name: f.dataType for f in docs.schema.fields}
    out = {}
    for name in fields:
        if name in flat:
            out[name] = flat[name].simpleString()
            continue
        parent, _, leaf = name.partition(".")
        sub = {x.name: x.dataType for x in flat[parent].fields}
        out[name] = sub[leaf].simpleString()
    return out


def _dv_kind(dtype: str) -> str:
    """Logical kind the serving twin dispatches on."""
    if dtype.startswith(("timestamp", "date")):
        return "ms"
    if dtype == "boolean":
        return "bool"
    if dtype.startswith(("tinyint", "smallint", "int", "bigint")):
        return "int"
    if dtype.startswith(("float", "double", "decimal")):
        return "float"
    return "str"


def write_doc_values(docs: DataFrame, index_dir: str, fields: list,
                     id_col: str = "doc_id", n_files: int = 1,
                     includes_runs: list | None = None) -> dict:
    """Persist the sidecar. One shuffle (range partition by doc_id); each
    output file is a doc_id-sorted slice, so readers merge slices with a
    single argsort over file order (or map id ranges to serving shards)."""
    kinds = {}
    cols = [F.col(id_col).cast("long").alias("doc_id")]
    for name, dtype in field_types(docs, fields).items():
        kind = _dv_kind(dtype)
        kinds[name] = kind
        # ONE canonical expression per kind (_dv_cast), shared with the
        # incremental refresh — base and delta files must stay
        # byte-identical in schema and values
        cols.append(_dv_cast(name, kind, docs))
    path = os.path.join(index_dir, DOC_VALUES)
    # generation stamp (__gen): rows are masked by barrier tombstones
    # when __gen <= barrier, exactly like postings (lsm virtual seq).
    # A FULL write bakes the current canonical view — every row in it
    # survives every EXISTING barrier by construction (masked rows are
    # excluded from the view), so stamping the current clock keeps them
    # live now while any FUTURE tombstone (allocated above the clock)
    # masks them, with the replacing delta row arriving at a higher seq.
    from .lsm import current_seq
    gen = current_seq(index_dir)
    (docs.select(*cols)
         .withColumn("__gen", F.lit(int(gen)).cast("long"))
         .repartitionByRange(max(1, int(n_files)), "doc_id")
         .sortWithinPartitions("doc_id")
         .write.mode("overwrite").parquet(path))
    meta = {"fields": kinds, "id_col": id_col,
            "includes_runs": list(includes_runs or []),
            "has_gen": True,
            # a delete compaction physically purges rows (and a re-add can
            # then reintroduce an id with NEW values) — the incremental
            # refresh must full-rebuild across that boundary or the
            # sidecar would hold two generations of the same doc_id
            "delete_epoch": _index_delete_epoch(index_dir),
            # resolution lineage (lsm.compact_runs resolve_events): a full
            # write bakes the canonical view, so it is current as of now
            "resolve_epoch": _index_resolve_state(index_dir)[0]}
    mp = os.path.join(index_dir, DV_META)
    with open(mp + ".tmp", "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(mp + ".tmp", mp)
    return meta


def _dv_cast(name: str, kind: str, frame: DataFrame):
    """The sidecar's canonical column expression for one field over a docs
    frame (shared by the full writer and the incremental refresh so both
    produce byte-identical values). Fields absent from the frame (an
    appended batch may omit optional columns) come back as typed nulls;
    dotted struct-leaf names resolve when the parent struct exists."""
    null_type = {"ms": "long", "int": "long", "float": "double",
                 "bool": "boolean"}.get(kind, "string")
    parent, _, leaf = name.partition(".")
    if parent not in frame.columns:
        return F.lit(None).cast(null_type).alias(name)
    if leaf:  # dotted struct-leaf: the parent may exist without the leaf
        ptype = frame.schema[parent].dataType
        if ptype.typeName() != "struct" or leaf not in ptype.fieldNames():
            return F.lit(None).cast(null_type).alias(name)
    col = F.col(name)
    if kind == "ms":
        return F.unix_millis(col.cast("timestamp")).alias(name)
    # explicit casts even for str/bool: an appended batch may carry a
    # differently-typed column (createDataFrame inference) — the delta
    # file's schema must match the base sidecar's exactly
    return col.cast(null_type).alias(name)


def refresh_doc_values(spark: SparkSession, index_dir: str,
                       full_docs: DataFrame | None = None,
                       id_col: str = "doc_id") -> dict | None:
    """Incremental sidecar refresh — O(appended batch), not O(corpus).

    The blocks twin of wand.refresh_blocks: for every LSM run not yet in
    the sidecar's ``includes_runs`` lineage, read the run's persisted
    docs batch (``docs_runs/<run_key>``, written by the append path),
    project it through the SAME column expressions as the full writer,
    and install ONE delta parquet file with a deterministic run-tagged
    name (``os.replace`` — a crash-replay overwrites its own file, never
    duplicates rows). The reader (serving._DVColumns) already argsorts
    slices into global doc_id order, so delta files may interleave the
    base ranges freely. dv meta is updated LAST; until then the sidecar
    reads as stale and aggregations fall back to the Spark path.

    Falls back to a full :func:`write_doc_values` over ``full_docs``
    (when given) if there is no previous sidecar or an uncovered run has
    no persisted docs batch (appends made through the raw
    ``lsm.append_docs`` API rather than the HTTP facade). Returns the
    updated meta, or None when a full rebuild was needed but no
    ``full_docs`` was supplied (callers treat the sidecar as stale)."""
    from .lsm import accounted_runs

    meta = load_doc_values_meta(index_dir)
    path = os.path.join(index_dir, DOC_VALUES)

    def _full():
        if full_docs is None:
            return None
        fields = servable_fields(full_docs, id_col)
        if not fields:
            return None
        included = [e["run_path"] for e in accounted_runs(index_dir)]
        return write_doc_values(full_docs, index_dir, fields,
                                id_col=id_col, includes_runs=included)

    if meta is None or not os.path.isdir(path):
        return _full()
    if int(meta.get("delete_epoch", 0)) != _index_delete_epoch(index_dir):
        # compact_deletes ran since this sidecar was written: rows were
        # physically purged and a re-added id may carry new values — a
        # delta install would leave two generations of the same doc_id
        # (aggregation double-count); rebuild from the canonical view
        return _full()
    if not meta.get("has_gen"):
        # pre-generation sidecar: a seq-stamped delta next to un-stamped
        # base files would give the pyarrow dataset a mixed schema (the
        # __gen column could silently vanish) — upgrade via one full
        # rebuild, after which every file carries the column
        return _full()
    included = set(meta.get("includes_runs", []))
    new_runs = [e for e in accounted_runs(index_dir)
                if e["run_path"] not in included]
    # tombstone RESOLUTIONS since this sidecar was written: an UNCOVERED
    # run folded by compact_runs reaches the sidecar below as its RAW
    # docs batch — including generations the flush purged — after the
    # masking tombstone is gone. Re-apply the recorded purges once the
    # deltas are installed (idempotent for rows the flush already
    # removed from covered files).
    built_res = int(meta.get("resolve_epoch", 0))
    now_res, events = _index_resolve_state(index_dir)
    stale_events = [ev for ev in events
                    if int(ev.get("epoch", 0)) > built_res]
    if built_res != now_res and (
            any("purges" not in ev for ev in stale_events)
            or {int(ev["epoch"]) for ev in stale_events}
            != set(range(built_res + 1, now_res + 1))):
        # pre-upgrade or pruned-away events: no exact purge set — rebuild
        return _full()
    pending: dict = {}
    for ev in stale_events:
        for k, v in (ev.get("purges") or {}).items():
            i = int(k)
            pending[i] = max(int(v), pending.get(i, -1))
    if not new_runs and built_res == now_res:
        return meta
    batches = []
    for e in new_runs:
        run_key = os.path.basename(e["run_path"])
        docs_dir = os.path.join(index_dir, "docs_runs", run_key)
        if not os.path.isdir(docs_dir):
            return _full()
        batches.append((e["run_path"], run_key, docs_dir,
                        int(e.get("seq", 0) or 0)))
    import shutil
    import tempfile
    kinds = meta["fields"]
    mid = meta.get("id_col", id_col)
    for run_path, run_key, docs_dir, run_seq in batches:
        batch = spark.read.parquet(docs_dir)
        cols = [F.col(mid).cast("long").alias("doc_id")]
        cols += [_dv_cast(name, kind, batch)
                 for name, kind in kinds.items()]
        staging = tempfile.mkdtemp(prefix="dv_delta_", dir=index_dir)
        try:
            (batch.select(*cols)
             # the run's generation: an upserted doc's OLD sidecar row
             # (lower __gen) is masked by its tombstone barrier while
             # this delta row (seq > barrier) serves the new values
             .withColumn("__gen", F.lit(run_seq).cast("long"))
             .repartitionByRange(1, "doc_id")
             .sortWithinPartitions("doc_id")
             .write.mode("overwrite").parquet(staging))
            files = sorted(f for f in os.listdir(staging)
                           if f.endswith(".parquet"))
            for i, f in enumerate(files):
                os.replace(os.path.join(staging, f),
                           os.path.join(path,
                                        f"delta-{run_key}-{i:03d}.parquet"))
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        included.add(run_path)
    if pending:
        # AFTER the delta installs: the purge must see the just-installed
        # files. Meta (resolve_epoch) is updated last, so a crash between
        # install and purge replays the purge on the next refresh.
        purge_doc_values(index_dir, pending)
    meta["includes_runs"] = sorted(included)
    meta["resolve_epoch"] = now_res
    mp = os.path.join(index_dir, DV_META)
    with open(mp + ".tmp", "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(mp + ".tmp", mp)
    return meta


def purge_doc_values(index_dir: str, drops: dict) -> int:
    """Physically remove superseded generations from the sidecar:
    ``drops`` maps doc_id → barrier; rows with that id and
    ``__gen <= barrier`` are rewritten out (the doc's NEW generation —
    a delta row with __gen > barrier — survives). Called by
    lsm.compact_runs when it resolves upsert tombstones, BEFORE the
    tombstone table shrinks, so nothing is ever transiently unmasked.

    Driver-side pyarrow, bounded by the dropped ids' files: per file,
    row-group doc_id min/max stats skip non-overlapping files; a hit
    file is rewritten atomically (tmp + os.replace) under its own name,
    so a crash replay just filters again. Returns rewritten file count.
    Files without a __gen column are pre-generation rows (generation 0
    — always <= barrier)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    path = os.path.join(index_dir, DOC_VALUES)
    if not drops or not os.path.isdir(path):
        return 0
    ids = sorted(int(i) for i in drops)
    lo, hi = ids[0], ids[-1]
    rewritten = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        fp = os.path.join(path, name)
        pf = pq.ParquetFile(fp)
        md = pf.metadata
        try:
            di = [md.schema.column(i).name
                  for i in range(md.num_columns)].index("doc_id")
            overlap = False
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(di).statistics
                if st is None or not st.has_min_max or \
                        (st.min <= hi and st.max >= lo):
                    overlap = True
                    break
        except ValueError:
            overlap = True
        if not overlap:
            continue
        t = pf.read()
        did = np.asarray(t.column("doc_id"), dtype=np.int64)
        gen = (np.asarray(pc.fill_null(t.column("__gen"), 0),
                          dtype=np.int64)
               if "__gen" in t.column_names
               else np.zeros(did.size, dtype=np.int64))
        bar = np.full(did.size, -1, dtype=np.int64)
        arr = np.asarray(ids, dtype=np.int64)
        pos = np.searchsorted(arr, did)
        pos[pos == arr.size] = 0
        hit = arr[pos] == did
        if not hit.any():
            continue
        bar[hit] = np.asarray([drops[int(d)] for d in did[hit]],
                              dtype=np.int64)
        keep = ~(hit & (gen <= bar))
        if keep.all():
            continue
        t2 = t.filter(pa.array(keep))
        tmp = fp + ".tmp"
        pq.write_table(t2, tmp)
        os.replace(tmp, fp)
        rewritten += 1
    return rewritten


def load_doc_values_meta(index_dir: str) -> dict | None:
    mp = os.path.join(index_dir, DV_META)
    if not os.path.isfile(mp):
        return None
    with open(mp) as fh:
        return json.load(fh)


def check_doc_values_fresh(index_dir: str, dv_meta: dict) -> bool:
    """False when LSM runs were appended after the sidecar was written —
    aggregations over it would silently undercount those docs — or when
    a :func:`consolidate_doc_values` pass is in flight / crashed mid-way
    (a half-consolidated sidecar can transiently hold duplicate rows,
    which would double-count). Mirrors wand.check_blocks_fresh but soft:
    callers fall back to Spark."""
    from .lsm import accounted_runs
    if os.path.isfile(os.path.join(index_dir, "dv_consolidating.json")):
        return False
    included = set(dv_meta.get("includes_runs", []))
    return all(e["run_path"] in included
               for e in accounted_runs(index_dir))


def consolidate_doc_values(spark: SparkSession, index_dir: str,
                           min_delta_files: int = 8) -> dict:
    """File-level major compaction of the sidecar's run deltas — the
    doc-values twin of wand.consolidate_blocks.

    Every incremental refresh installs one ``delta-<run>`` file, and each
    column read pays one footer+slice per file, so long-lived indexes
    decay. When ``>= min_delta_files`` delta files exist, merge them into
    ONE doc_id-sorted ``delta-merged-m<seq>`` file (kept under the
    ``delta-`` prefix so later passes re-consolidate it). Content is
    preserved verbatim; dv meta and run lineage stay valid untouched.

    Crash-safe via a ``dv_consolidating.json`` marker written first and
    removed last: while present :func:`check_doc_values_fresh` returns
    False, so serving falls back to the Spark path (which never reads
    the sidecar) instead of double-counting transiently duplicated rows.
    A replay re-reads the current delta set (``dropDuplicates`` over
    full rows makes the install-then-crash case exact — appended doc ids
    are unique, so only exact copies can collide) and replaces its own
    deterministic file name."""
    import shutil
    import tempfile
    import time

    path = os.path.join(index_dir, DOC_VALUES)
    marker = os.path.join(index_dir, "dv_consolidating.json")
    if not os.path.isdir(path):
        return {"merged_files": 0}
    meta = load_doc_values_meta(index_dir) or {}
    seq = int(meta.get("consolidations", 0)) + 1
    if os.path.isfile(marker):
        with open(marker) as fh:
            seq = int(json.load(fh).get("seq", seq))
    deltas = sorted(f for f in os.listdir(path)
                    if f.startswith("delta-") and f.endswith(".parquet"))
    if not deltas:
        # replay with nothing to merge (a full sidecar rebuild wiped the
        # deltas after a crashed pass left its marker): there are no
        # delta files, hence nothing transiently duplicated — clear the
        # marker instead of handing spark.read.parquet() zero paths,
        # which would raise forever and leave the sidecar marked stale
        if os.path.isfile(marker):
            os.remove(marker)
        return {"merged_files": 0}
    if len(deltas) < max(int(min_delta_files), 2) \
            and not os.path.isfile(marker):
        return {"merged_files": 0}
    t0 = time.time()
    with open(marker + ".tmp", "w") as fh:
        json.dump({"seq": seq}, fh)
    os.replace(marker + ".tmp", marker)
    target = f"delta-merged-m{seq:04d}-000.parquet"
    staging = tempfile.mkdtemp(prefix="dv_consol_", dir=index_dir)
    try:
        (spark.read.parquet(*[os.path.join(path, f) for f in deltas])
         .dropDuplicates()  # exact under install-then-crash replay
         .repartitionByRange(1, "doc_id")
         .sortWithinPartitions("doc_id")
         .write.mode("overwrite").parquet(staging))
        part = sorted(f for f in os.listdir(staging)
                      if f.endswith(".parquet"))
        # single range partition → exactly one data file
        os.replace(os.path.join(staging, part[0]),
                   os.path.join(path, target))
        for f in deltas:
            if f != target:
                os.remove(os.path.join(path, f))
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    if meta:
        meta["consolidations"] = seq
        mp = os.path.join(index_dir, DV_META)
        with open(mp + ".tmp", "w") as fh:
            json.dump(meta, fh, indent=1)
        os.replace(mp + ".tmp", mp)
    os.remove(marker)
    return {"merged_files": len([f for f in deltas if f != target]),
            "target": target, "seconds": round(time.time() - t0, 3)}


def enrich_rows(docs: DataFrame, id_col: str, doc_ids: list,
                fields: list) -> dict:
    """{doc_id: JSON-safe stored-field dict} for a small hit page — the
    Spark-path twin of ServingIndex.enrich (the reference spreads the
    stored document into each hit, SearchEngine.ts:619-627). The id
    filter is a pushed-down IN over ≤ page-size ids; values normalize
    exactly like the sidecar (timestamps → shared ISO-8601-ms formatter),
    so both paths return byte-identical hits."""
    if not doc_ids or not fields:
        return {}
    from .agg_compile import iso_ms
    kinds = {}
    # raw id, NOT cast: the Spark path enriches string-id corpora too
    # (only the blocks/serving artifacts require numeric ids)
    cols = [F.col(id_col).alias("__id")]
    for name, dtype in field_types(docs, fields).items():
        kind = _dv_kind(dtype)
        kinds[name] = kind
        if kind == "ms":
            cols.append(F.unix_millis(F.col(name).cast("timestamp"))
                        .alias(name))
        elif kind == "float":
            cols.append(F.col(name).cast("double").alias(name))
        elif kind == "int":
            cols.append(F.col(name).cast("long").alias(name))
        else:
            cols.append(F.col(name).alias(name))
    rows = (docs.where(F.col(id_col).isin(list(doc_ids)))
            .select(*cols).collect())
    out: dict = {}
    for r in rows:
        d = {}
        for name in fields:
            v = r[name]
            d[name] = (None if v is None
                       else iso_ms(int(v)) if kinds[name] == "ms" else v)
        out[r["__id"]] = d
    return out


def doc_values_frame(spark: SparkSession, index_dir: str) -> DataFrame:
    """The sidecar as a DataFrame (doc_id + stored columns) — handy for
    tests and for Spark-side joins against serving-era artifacts."""
    return spark.read.parquet(os.path.join(index_dir, DOC_VALUES))
