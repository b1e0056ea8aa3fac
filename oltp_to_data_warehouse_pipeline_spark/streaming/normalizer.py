"""CDC JSON normalizer — the `mongo_postgres_cdc.py` semantics, declarative.

The reference processes one message at a time in Python (`process_message`,
`mongo_postgres_cdc.py:289-356`); here the same rules are split into

1. driver-side *schema* work on a bounded sample (inference + widening +
   name sanitization + collision renaming — `:216-241,316-332`), and
2. distributed *data* work as column expressions (`from_json`, flattening,
   epoch promotion, NaN/blank scrubbing, key extraction — `:90-214,136-161`),

so the per-row path is pure Catalyst.  B9 is fixed: schemas evolve
additively (see `merge_schemas`) instead of freezing on the first message.

Normalization rules implemented (cites into the reference):
- type inference bool/int/float/str/datetime → BOOLEAN/BIGINT/DOUBLE/TEXT/
  TIMESTAMP (`:226-241`) with deterministic widening bool→long→double→string
- nested objects flattened to ``parent_child`` when depth < 2, ≤ 5 keys, all
  scalar (`:165-188`); otherwise JSON-stringified; arrays always
  JSON-stringified (`:190-197`)
- epoch ints: [1e9,1e10) secs / [1e12,1e13) millis → timestamp (`:144-156`)
- NaN → NULL (`:158-161`); blank/whitespace strings → NULL (`:139-142`)
- identifier sanitize: lower, ``-``/space/``.``→``_``, strip non-alnum,
  digit-prefix → ``col_`` prefix (`:216-224`)
- collision renaming ``name_1, name_2, …`` (`:316-332`)
- primary key: first of _id,id,uuid,key,pk,objectId else any ``*id`` field,
  cast to string; messages without one are rejected (`:199-214`)
- metadata columns kafka_topic/processed_at/updated_at + full original
  document retained as ``raw_data`` (`:261-265,334-338`)
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_NESTING_DEPTH = 2
MAX_FLATTEN_KEYS = 5
PK_CANDIDATES = ("_id", "id", "uuid", "key", "pk", "objectId")
RESERVED = ("kafka_primary_key", "kafka_topic", "raw_data", "processed_at", "updated_at")

# widening lattice: bool -> long -> double -> string (string absorbs all)
_WIDEN_ORDER = {"boolean": 0, "bigint": 1, "double": 2, "timestamp": 2, "string": 3}


def sanitize_identifier(name: str) -> str:
    """`mongo_postgres_cdc.py:216-224` — lower, separators→_, strip junk,
    digit-prefix → col_."""
    out = name.strip().lower()
    out = re.sub(r"[-\s.]+", "_", out)
    out = re.sub(r"[^a-z0-9_]", "", out)
    if not out or out[0].isdigit():
        out = f"col_{out}"
    return out


def topic_to_table(topic: str) -> str:
    """`mongo_postgres_cdc.py:76-88` — topic name → landing-table name."""
    return sanitize_identifier(topic.replace(".", "_"))


def _scalar_type(v) -> str | None:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        # epoch promotion happens as an expression later; inference keeps long
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    return None


def _widen(a: str, b: str) -> str:
    if a == b:
        return a
    if {a, b} == {"bigint", "double"}:
        return "double"
    if {a, b} <= {"boolean", "bigint", "double"}:
        return "double" if "double" in (a, b) else "bigint"
    return "string"


@dataclass
class InferredField:
    """One output column: its type and the JSON path it came from."""

    sql_type: str
    path: list[str]  # e.g. ["user", "name"] -> column user_name
    is_json_blob: bool = False  # arrays / deep / wide objects -> to_json string
    epoch_candidate: bool = False  # some sampled value fell in the epoch ranges


@dataclass
class InferredSchema:
    fields: dict[str, InferredField] = field(default_factory=dict)

    def merge(self, other: "InferredSchema") -> "InferredSchema":
        """Additive evolution (B9 fixed): union of columns, widened types."""
        out = InferredSchema(dict(self.fields))
        for name, f in other.fields.items():
            if name in out.fields:
                cur = out.fields[name]
                if cur.path == f.path and cur.is_json_blob == f.is_json_blob:
                    out.fields[name] = InferredField(
                        _widen(cur.sql_type, f.sql_type),
                        cur.path,
                        cur.is_json_blob,
                        cur.epoch_candidate or f.epoch_candidate,
                    )
                else:
                    out.fields[name] = InferredField("string", cur.path, True)
            else:
                out.fields[name] = f
        return out


def _assign_name(base: str, taken: set[str]) -> str:
    """Collision renaming `name_1, name_2, …` (`mongo_postgres_cdc.py:316-332`);
    reserved metadata names collide by definition."""
    name = base
    i = 0
    while name in taken or name in RESERVED:
        i += 1
        name = f"{base}_{i}"
    taken.add(name)
    return name


def infer_schema(sample_docs: list[str]) -> InferredSchema:
    """Value-driven schema inference over a bounded sample (driver-side, like
    the reference's first-message inference but across a sample and with
    widening — the data path never sees Python)."""
    schema = InferredSchema()
    for raw in sample_docs:
        try:
            doc = json.loads(raw)
        except (ValueError, TypeError):
            continue
        if not isinstance(doc, dict):
            continue
        one = InferredSchema()
        taken: set[str] = set()
        _infer_doc(doc, [], 0, one, taken)
        schema = schema.merge(one)
    return schema


def _infer_doc(obj: dict, path: list[str], depth: int, out: InferredSchema, taken: set[str]) -> None:
    for key, value in obj.items():
        col_base = sanitize_identifier("_".join(path + [key]))
        if isinstance(value, dict):
            flattenable = (
                depth < MAX_NESTING_DEPTH - 1
                and len(value) <= MAX_FLATTEN_KEYS
                and all(not isinstance(v, (dict, list)) for v in value.values())
            )
            if flattenable:
                _infer_doc(value, path + [key], depth + 1, out, taken)
            else:
                name = _assign_name(col_base, taken)
                out.fields[name] = InferredField("string", path + [key], is_json_blob=True)
        elif isinstance(value, list):
            name = _assign_name(col_base, taken)
            out.fields[name] = InferredField("string", path + [key], is_json_blob=True)
        else:
            t = _scalar_type(value)
            if t is None and value is not None:
                continue
            name = _assign_name(col_base, taken)
            is_epoch = isinstance(value, int) and not isinstance(value, bool) and (
                1_000_000_000 <= value < 10_000_000_000
                or 1_000_000_000_000 <= value < 10_000_000_000_000
            )
            out.fields[name] = InferredField(t or "string", path + [key], epoch_candidate=is_epoch)


def _epoch_promote(c: Column) -> Column:
    """F24 — 10-digit-second / 13-digit-milli ints → timestamp."""
    return (
        F.when((c >= 1_000_000_000) & (c < 10_000_000_000), F.timestamp_seconds(c))
        .when((c >= 1_000_000_000_000) & (c < 10_000_000_000_000), F.timestamp_millis(c))
        .otherwise(F.lit(None).cast("timestamp"))
    )


def _json_path(path: list[str]) -> str:
    return "$." + ".".join(f"['{p}']" if re.search(r"[.\s]", p) else p for p in path)


def normalize(
    df: DataFrame,
    schema: InferredSchema,
    value_col: str = "value",
    topic_col: str | None = "topic",
    promote_epoch: bool = True,
) -> DataFrame:
    """Apply the full normalization as ONE projection over the raw JSON.

    Uses get_json_object per column (robust to heterogeneous/evolving
    payloads — a missing path is just NULL, corrupt JSON yields an
    all-NULL row that the pk filter drops = poison-message tolerance ST5).
    """
    cols: list[Column] = []
    raw = F.col(value_col)
    for name, fld in sorted(schema.fields.items()):
        jp = _json_path(fld.path)
        base = F.get_json_object(raw, jp)
        if fld.is_json_blob:
            cols.append(base.alias(name))
            continue
        t = fld.sql_type
        if t == "bigint":
            as_long = base.cast("bigint")
            cols.append(as_long.alias(name))
            if promote_epoch and fld.epoch_candidate and f"{name}_ts" not in schema.fields:
                # epoch-promoted twin column (keeps the long AND the timestamp
                # — additive, so the downstream choice is explicit).  Skipped
                # when the payload itself carries a real <name>_ts field —
                # emitting both would duplicate the output column name.
                cols.append(_epoch_promote(as_long).alias(f"{name}_ts"))
        elif t == "double":
            v = base.cast("double")
            cols.append(F.when(F.isnan(v), F.lit(None)).otherwise(v).alias(name))
        elif t == "boolean":
            cols.append(base.cast("boolean").alias(name))
        else:
            cols.append(F.nullif(F.trim(base), F.lit("")).alias(name))

    pk = extract_primary_key(raw, schema)
    cols.append(pk.alias("kafka_primary_key"))
    if topic_col is not None and topic_col in df.columns:
        cols.append(F.col(topic_col).cast("string").alias("kafka_topic"))
    if "offset" in df.columns:
        # within-batch message order: every row gets the same
        # current_timestamp() below, so the source offset is what makes
        # same-key LWW pick the genuinely newest message
        cols.append(F.col("offset").cast("bigint").alias("kafka_offset"))
    cols.append(raw.alias("raw_data"))
    cols.append(F.current_timestamp().alias("processed_at"))
    cols.append(F.current_timestamp().alias("updated_at"))
    out = df.select(*cols)
    # reject messages without a primary key (`mongo_postgres_cdc.py:199-214`)
    return out.where(F.col("kafka_primary_key").isNotNull())


def rejected(
    df: DataFrame, schema: InferredSchema, value_col: str = "value", topic_col: str = "topic"
) -> DataFrame:
    """The complement of :func:`normalize`'s keep-set: messages with no
    extractable primary key (corrupt JSON or pk-less payload) — the
    dead-letter stream.  Same predicate, negated, so keep ∪ reject = input.
    """
    pk = extract_primary_key(F.col(value_col), schema)
    cols = [F.col(value_col).alias("raw_data")]
    if topic_col in df.columns:
        cols.append(F.col(topic_col).cast("string").alias("kafka_topic"))
    cols.append(F.lit("no_primary_key").alias("reject_reason"))
    cols.append(F.current_timestamp().alias("rejected_at"))
    return df.where(pk.isNull()).select(*cols)


def extract_primary_key(raw: Column, schema: InferredSchema) -> Column:
    """F27 — first of the candidate keys, else any ``*id`` field, as string."""
    candidates = [F.get_json_object(raw, f"$.{k}") for k in PK_CANDIDATES]
    id_like = sorted(
        name
        for name, fld in schema.fields.items()
        if name.endswith("id") and len(fld.path) == 1 and fld.path[0] not in PK_CANDIDATES
    )
    for name in id_like:
        candidates.append(F.get_json_object(raw, _json_path(schema.fields[name].path)))
    return F.coalesce(*candidates).cast("string") if candidates else F.lit(None).cast("string")
