"""JSON-lines source/sink — the interchange format of most LLM corpus
tooling. Explicit schema on read (inference is banned engine-wide,
SURVEY §1.2, and a schema-inference pass would double-scan 100 TB).

Scale notes: one JSONL file per task both ways (no driver collect);
doubles survive the round trip bit-exactly because Spark writes the
shortest round-trip decimal repr. Line-splittable, so a directory of
JSONL parallelizes like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a frame as a directory of JSON-lines part files."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSON-lines with an explicit schema. ``FAILFAST`` surfaces
    corrupt lines as errors instead of silent nulls (matching the CSV
    loader's contract, sources/csv.py)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE JSONL read that QUARANTINES bad lines instead of
    failing the job — the ingest mode for web-scale corpora where some
    malformed fraction is a certainty and one bad shard must not kill a
    100 TB load. Valid rows parse into the declared schema; corrupt
    lines land whole in ``corrupt_col`` with every data column NULL, so
    the caller can split the frame into clean/quarantine sinks with one
    ``isNull`` filter and account for every input line.

    The corrupt column must be part of the declared schema (Spark drops
    it otherwise); this helper appends it. Spark requires caching or
    persistence of the parsed frame before filtering on the corrupt
    column alone — callers filtering should select data columns too
    (both helpers in tests do).
    """
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        full = f"{schema}, {corrupt_col} string"
    else:
        full = StructType(schema.fields[:]).add(corrupt_col, StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def register_sequence_source(spark: SparkSession) -> None:
    """Register ``seqgen`` — a CUSTOM PYTHON DATA SOURCE (the Spark 4
    DataSource API): a partitioned deterministic integer-sequence
    generator, the minimal end-to-end exercise of the batch-reader
    contract (schema declaration, partition planning, per-partition
    iteration). Each partition yields its own id range, so the source
    scales out like any file source; values are a pure function of the
    id, which is what lets a SQL oracle replay the output exactly.

    Options: ``n`` (total rows), ``parts`` (input partitions).
    """
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class _SeqReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.parts = int(options.get("parts", 4))

        def partitions(self):
            step = max(1, self.n // self.parts)
            bounds = list(range(0, self.n, step)) + [self.n]
            return [
                _RangePartition(bounds[i], bounds[i + 1])
                for i in range(len(bounds) - 1)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                # value = pure function of id → oracle-replayable
                yield (i, (i * i) % 997, f"row-{i % 7}")

    class SeqSource(DataSource):
        @classmethod
        def name(cls):
            return "seqgen"

        def schema(self):
            return "id BIGINT, sq_mod INT, tag STRING"

        def reader(self, schema):
            return _SeqReader(self.options)

    spark.dataSource.register(SeqSource)


def register_sequence_stream_source(spark: SparkSession) -> None:
    """Register ``seqstream`` — the STREAMING half of the Spark 4
    Python DataSource API (SimpleDataSourceStreamReader): a
    deterministic micro-batched integer sequence with explicit offset
    management. Offsets advance ``batch`` ids per trigger up to ``n``,
    then stop — so ``processAllAvailable()`` terminates and the emitted
    set is exactly the ids [0, n), REGARDLESS of how the engine chops
    the offset range into batches (readBetweenOffsets replays any
    offset interval deterministically, which is also what makes the
    source exactly-once under checkpoint recovery).

    Rows are the same pure function of the id as the batch ``seqgen``
    source (:func:`register_sequence_source`), so one SQL oracle gates
    both halves of the API.
    """
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    def _rows(start: int, end: int):
        # a LIST-backED ITERATOR, precisely: the runner calls next() on
        # it (so a bare list fails) AND pickles it into the prefetch
        # cache (so a generator fails) — list iterators satisfy both
        return iter([(i, (i * i) % 997, f"row-{i % 7}") for i in range(start, end)])

    class _SeqStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.batch = int(options.get("batch", 100))

        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = int(start["pos"])
            end = min(pos + self.batch, self.n)
            return _rows(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return _rows(int(start["pos"]), int(end["pos"]))

    class SeqStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "seqstream"

        def schema(self):
            return "id BIGINT, sq_mod INT, tag STRING"

        def simpleStreamReader(self, schema):
            return _SeqStreamReader(self.options)

    spark.dataSource.register(SeqStreamSource)


def register_jsonl_sink(spark: SparkSession) -> None:
    """Register ``jsonlsink`` — the WRITER side of the Spark 4 Python
    DataSource API (the batch-reader/stream-reader surfaces are
    exercised by ``seqgen``/``seqstream`` above; this completes the
    contract: schema receipt, per-partition executor writes, commit
    messages, driver-side commit/abort). Each task writes its
    partition to ``part-<pid>.jsonl`` under the ``path`` option and
    returns a commit message with its row count; ``commit`` publishes
    a ``_SUCCESS`` manifest with the total, ``abort`` removes the
    partials — the same files-then-manifest protocol every production
    sink here uses (sources/versioned.py, write_audit_publish).

    ``mode("overwrite")`` clears the target driver-side before tasks
    launch; ``append`` adds new part files under a per-JOB uuid
    (``part-<jobuuid>-<pid>.jsonl``) so two appends with overlapping
    partition ids never collide — without the uuid a second append
    silently overwrote the first append's files, and ``commit``
    rewrote ``_SUCCESS`` with only the latest job's counts.
    """
    import json as _json
    import os
    import shutil
    import uuid as _uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _Done(WriterCommitMessage):
        def __init__(self, path: str, count: int):
            self.path, self.count = path, count

    class _JsonlWriter(DataSourceWriter):
        def __init__(self, options, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("jsonlsink requires option 'path'")
            self.overwrite = overwrite
            # per-JOB uuid, minted driver-side and serialized to every
            # task: append jobs with overlapping partition ids write
            # disjoint filenames instead of silently clobbering
            self.job_id = _uuid.uuid4().hex[:12]
            # driver side: prepare the target before tasks launch
            if overwrite and os.path.isdir(self.path):
                shutil.rmtree(self.path)
            os.makedirs(self.path, exist_ok=True)

        def write(self, iterator):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            out = os.path.join(
                self.path, f"part-{self.job_id}-{pid:05d}.jsonl"
            )
            n = 0
            with open(out, "w") as fh:
                for row in iterator:
                    fh.write(
                        _json.dumps(
                            row.asDict(recursive=True),
                            sort_keys=True,
                            default=str,
                        )
                    )
                    fh.write("\n")
                    n += 1
            return _Done(out, n)

        def commit(self, messages):
            # append-mode totals are a read-modify-write of _SUCCESS:
            # SINGLE-WRITER BY CONTRACT (ADVICE r7 #5) — two concurrent
            # append jobs both succeed (their part files are uuid-
            # disjoint) but the later commit's totals win. A corrupt or
            # partial prior _SUCCESS must not fail an otherwise
            # complete job: rebuild the prior totals from the per-file
            # count JOURNAL (_SUCCESS.files, one JSONL line per
            # committed part — O(#files), ADVICE r8 #3), line-counting
            # only legacy/unjournaled files, and WARN that recovery ran
            # (the rebuilt total also folds in any not-yet-committed
            # concurrent job's parts — single-writer is a contract, not
            # an enforcement, so the signal must not be silent).
            total = sum(m.count for m in messages)
            n_files = len(messages)
            success = os.path.join(self.path, "_SUCCESS")
            journal = os.path.join(self.path, "_SUCCESS.files")
            if not self.overwrite and os.path.exists(success):
                ours = {os.path.basename(m.path) for m in messages}
                try:
                    with open(success) as fh:
                        prev = _json.load(fh)
                    if not isinstance(prev, dict):
                        raise ValueError("non-dict _SUCCESS")
                    total += prev.get("rows", 0)
                    n_files += prev.get("files", 0)
                except (ValueError, OSError):
                    import warnings

                    warnings.warn(
                        f"jsonlsink: malformed _SUCCESS under "
                        f"{self.path}; rebuilding prior totals from "
                        f"the part-file journal (uncommitted "
                        f"concurrent parts, if any, are folded in)",
                        UserWarning,
                        stacklevel=2,
                    )
                    journaled: dict[str, int] = {}
                    try:
                        with open(journal) as fh:
                            for line in fh:
                                try:
                                    rec = _json.loads(line)
                                    journaled[rec["file"]] = int(rec["rows"])
                                except (ValueError, KeyError, TypeError):
                                    continue  # a torn line costs one
                                    # file's fast path, never the commit
                    except OSError:
                        pass
                    for name in os.listdir(self.path):
                        if (
                            name.startswith("part-")
                            and name.endswith(".jsonl")
                            and name not in ours
                        ):
                            n_files += 1
                            if name in journaled:
                                total += journaled[name]
                            else:
                                # legacy pre-journal file: line count
                                # (jsonl is one row per line)
                                with open(
                                    os.path.join(self.path, name)
                                ) as fh:
                                    total += sum(1 for _ in fh)
            with open(journal, "a") as fh:
                for m in messages:
                    fh.write(
                        _json.dumps(
                            {
                                "file": os.path.basename(m.path),
                                "rows": m.count,
                            }
                        )
                    )
                    fh.write("\n")
            with open(success, "w") as fh:
                _json.dump({"rows": total, "files": n_files}, fh)

        def abort(self, messages):
            for m in messages:
                if m is not None and os.path.exists(m.path):
                    os.remove(m.path)

    class JsonlSink(DataSource):
        @classmethod
        def name(cls):
            return "jsonlsink"

        def writer(self, schema, overwrite: bool):
            return _JsonlWriter(self.options, overwrite)

    spark.dataSource.register(JsonlSink)
