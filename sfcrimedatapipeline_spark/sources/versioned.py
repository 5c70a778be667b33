"""Manifest-based versioned table: snapshot isolation, time travel,
and rollback over plain parquet — the maintenance surface the
reference's full-refresh Postgres loads (/root/reference/dags/
ELT.py:88-110, drop-and-recreate per run) cannot offer, rebuilt on the
pattern every modern lakehouse format uses (a tiny JSON commit log
naming immutable data files).

Layout::

    <path>/data/<uuid>/part-*.parquet   -- immutable file groups
    <path>/_manifests/v<N>.json         -- {"version", "files", ...}
    <path>/_latest                      -- text file: highest committed N

Write protocol (crash-safe without a transaction coordinator):

1. Write the new snapshot's parquet under a fresh ``data/<uuid>/``
   directory — invisible to readers, who only trust the manifest.
2. Write ``v<N>.json`` via tmp-file + ``os.replace`` (atomic on POSIX).
3. Update ``_latest`` the same way. A crash between 2 and 3 leaves a
   committed-but-unadvertised version: the next writer reuses the next
   free N, readers still see the last advertised snapshot — never a
   torn read, because no data file is ever mutated or deleted by a
   write.

Readers resolve a version (default: latest) to its file list and hand
Spark exactly those paths — an old snapshot stays readable forever
until ``vacuum`` drops file groups no retained manifest references.
``rollback`` is a METADATA write: a new version whose manifest points
at the old version's files (no data copy — the lakehouse property that
makes un-publishing a bad load O(bytes-of-JSON) at 100 TB, not a
rewrite).

Single-writer by design (like the reference's Airflow DAG); a real
deployment serializes commits through an optimistic rename — the
manifest naming here (``os.replace`` fails never, last-writer-wins on
identical N) documents where that CAS would slot in.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFESTS = "_manifests"
_LATEST = "_latest"

#: Replay-guard fallback scan bounds (module-level so tests can pin
#: them). REPLAY_WINDOW: how many of THIS query's manifests the
#: newest-first scan examines — Spark retries land within a handful of
#: batches of a crash (ADVICE r7 #2: the window must count this
#: query's commits, or >32 other-writer versions between crash and
#: restart push the replayed manifest out of view). TOTAL_SCAN_CAP:
#: bound on TOTAL manifests read per micro-batch (ADVICE r8 #2) — the
#: per-query window alone still reads-and-skips every other writer's
#: manifest, making the fallback O(total versions) in a directory
#: dominated by other writers. The per-query sidecar index makes the
#: common path O(1); the cap bounds the no-index fallback, and hitting
#: it WARNS (a replay could in principle slip past a capped scan on a
#: pre-index table — never silent).
REPLAY_WINDOW = 32
TOTAL_SCAN_CAP = max(256, 8 * REPLAY_WINDOW)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _MANIFESTS, f"v{version}.json")


def _atomic_write(target: str, payload: str) -> None:
    tmp = target + f".tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        fh.write(payload)
    os.replace(tmp, target)


def list_versions(path: str) -> list[int]:
    mdir = os.path.join(path, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(path: str) -> int | None:
    """Highest COMMITTED version. The manifest, not the ``_latest``
    pointer, is the commit: a crash between the manifest rename and
    the pointer rename must not hide (or let a later writer clobber)
    the committed snapshot, so this scans the manifest directory — a
    listing of tiny JSON files, O(versions) — and treats the pointer
    purely as a convenience for external tools."""
    versions = list_versions(path)
    return max(versions) if versions else None


def read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def write_version(df: DataFrame, path: str, note: str = "") -> int:
    """Commit ``df`` as the next version of the table at ``path``.
    Returns the new version number. The dataframe is written ONCE
    (plain distributed parquet write); the commit itself is two tiny
    local JSON renames."""
    group = uuid.uuid4().hex
    data_dir = os.path.join(path, "data", group)
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    version = (latest_version(path) or 0) + 1
    while os.path.exists(_manifest_path(path, version)):
        version += 1  # skip committed-but-unadvertised survivors
    manifest = {
        "version": version,
        "files": files,
        "note": note,
        "n_files": len(files),
        "committed_at": time.time(),
        "schema": df.schema.json(),
    }
    os.makedirs(os.path.join(path, _MANIFESTS), exist_ok=True)
    _atomic_write(
        _manifest_path(path, version), json.dumps(manifest, indent=1)
    )
    _atomic_write(os.path.join(path, _LATEST), str(version))
    return version


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot (default: latest). Exactly the manifest's files
    are scanned — concurrent writers appending new file groups can
    never leak into this read (snapshot isolation)."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed version at {path}")
    m = read_manifest(path, v)
    return spark.read.parquet(*m["files"])


def rollback(path: str, to_version: int) -> int:
    """Publish a NEW version whose manifest references ``to_version``'s
    files — metadata-only un-publish; history is append-only (the bad
    version stays inspectable)."""
    m = read_manifest(path, to_version)
    version = (latest_version(path) or 0) + 1
    while os.path.exists(_manifest_path(path, version)):
        version += 1
    manifest = dict(
        m,
        version=version,
        note=f"rollback to v{to_version}",
        committed_at=time.time(),
    )
    _atomic_write(
        _manifest_path(path, version), json.dumps(manifest, indent=1)
    )
    _atomic_write(os.path.join(path, _LATEST), str(version))
    return version


def history(path: str) -> list[dict]:
    """Commit log, oldest first: version, note, file count, schema
    fingerprint — the audit trail a drop-and-recreate load never has."""
    out = []
    for v in list_versions(path):
        m = read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "note": m.get("note", ""),
                "n_files": m.get("n_files", len(m["files"])),
                "committed_at": m.get("committed_at"),
            }
        )
    return out


def vacuum(path: str, keep_versions: int = 2) -> list[str]:
    """Delete data file GROUPS referenced only by manifests older than
    the newest ``keep_versions`` (the manifests stay — history remains
    browsable, the bytes are reclaimed). Returns removed group dirs.

    Safe order: compute the retained file set FIRST, then delete
    groups fully outside it — a crash mid-vacuum only leaves garbage,
    never a broken retained snapshot.

    Retention is compared by group-directory BASENAME (the uuid), not
    by full path: manifests record the path string used at write time,
    and a vacuum called with an equivalent-but-differently-spelled
    path (relative vs absolute, ``./`` prefix, symlinked parent)
    must never conclude that every retained group is deletable."""
    import shutil

    if keep_versions < 1:
        raise ValueError(
            f"keep_versions must be >= 1 (got {keep_versions}): retaining "
            "zero versions would delete the latest committed snapshot while "
            "its manifest remains, leaving every subsequent read dangling"
        )
    versions = list_versions(path)
    keep = set(versions[-keep_versions:])
    retained: set[str] = set()
    for v in keep:
        retained.update(
            os.path.basename(os.path.dirname(f))
            for f in read_manifest(path, v)["files"]
        )
    removed = []
    data_root = os.path.join(path, "data")
    if os.path.isdir(data_root):
        for group in sorted(os.listdir(data_root)):
            if group not in retained:
                gdir = os.path.join(data_root, group)
                shutil.rmtree(gdir)
                removed.append(gdir)
    return removed


def append_version(
    df: DataFrame, path: str, note: str = "", extra: dict | None = None
) -> int:
    """APPEND transaction: commit a new version whose manifest is the
    previous version's file list PLUS the new file group — the
    lakehouse append (incremental loads, one commit per micro-batch).
    Readers at v(N-1) never see the new rows; time travel replays the
    ingestion history point-by-point."""
    prev = latest_version(path)
    prev_files = read_manifest(path, prev)["files"] if prev else []
    group = uuid.uuid4().hex
    data_dir = os.path.join(path, "data", group)
    df.write.mode("errorifexists").parquet(data_dir)
    files = prev_files + sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    version = (prev or 0) + 1
    while os.path.exists(_manifest_path(path, version)):
        version += 1
    manifest = {
        "version": version,
        "files": files,
        "note": note,
        "n_files": len(files),
        "committed_at": time.time(),
        "schema": df.schema.json(),
        **(extra or {}),
    }
    os.makedirs(os.path.join(path, _MANIFESTS), exist_ok=True)
    _atomic_write(
        _manifest_path(path, version), json.dumps(manifest, indent=1)
    )
    _atomic_write(os.path.join(path, _LATEST), str(version))
    return version


def versioned_stream_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str = "versioned_sink",
):
    """Structured-Streaming sink into the versioned table: every
    micro-batch is ONE append transaction (``foreachBatch`` →
    :func:`append_version`), so the commit history IS the ingestion
    log — a consumer reading v(N) sees exactly batches 1..N, and a
    failed downstream job replays from any version. Composes Spark's
    checkpoint-based exactly-once batch ids with the manifest commit:
    a batch retried after a crash overwrites nothing (new uuid group;
    the duplicate-batch guard is the DEDICATED ``stream_batch_id`` +
    ``stream_query`` manifest fields — never the free-text note, which
    a manual append/rollback could collide with — checked against the
    most recent manifests before committing; two distinct streams
    writing the same table are disambiguated by query name). Returns
    the started StreamingQuery (availableNow trigger — drains the
    source, then stops)."""

    def _index_path() -> str:
        import hashlib

        safe = hashlib.md5(query_name.encode()).hexdigest()[:16]
        return os.path.join(path, _MANIFESTS, f"_last_batch.{safe}.json")

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        # O(1) primary guard: a per-query sidecar records the max
        # committed batch id (atomic write, updated after every
        # commit). Batch ids per query are monotone, so id ≤ recorded
        # max ⇔ replay. A crash BETWEEN append and index update only
        # leaves the index stale-low — the manifest scan below still
        # catches that batch — never stale-high.
        try:
            with open(_index_path()) as fh:
                last = json.load(fh).get("stream_batch_id")
            if isinstance(last, int) and batch_id <= last:
                return  # replayed batch: already committed, skip
        except (OSError, ValueError):
            pass  # no/corrupt index: fall through to the manifest scan
        seen_this_query = 0
        total_read = 0
        for v in reversed(list_versions(path)):
            if total_read >= TOTAL_SCAN_CAP:
                import warnings

                warnings.warn(
                    f"versioned_stream_sink({query_name}): replay scan "
                    f"capped at {TOTAL_SCAN_CAP} manifests without "
                    f"finding this query's commits — if this table "
                    f"predates the per-query batch index, a replayed "
                    f"batch may double-append",
                    UserWarning,
                    stacklevel=2,
                )
                break
            m = read_manifest(path, v)
            total_read += 1
            if m.get("stream_query") != query_name:
                continue  # other writers don't consume the window
            if m.get("stream_batch_id") == batch_id:
                return  # replayed batch: already committed, skip
            if (
                isinstance(m.get("stream_batch_id"), int)
                and m["stream_batch_id"] < batch_id
            ):
                break  # monotone ids: older manifests can't hold it
            seen_this_query += 1
            if seen_this_query >= REPLAY_WINDOW:
                break
        append_version(
            batch_df,
            path,
            note=f"stream batch {batch_id}",
            extra={"stream_batch_id": batch_id, "stream_query": query_name},
        )
        _atomic_write(
            _index_path(),
            json.dumps({"stream_batch_id": batch_id, "stream_query": query_name}),
        )

    return (
        stream_df.writeStream.foreachBatch(commit)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
