"""Schema utilities (SURVEY.md §1.3, U3): nested path resolution, schema
merge with compatibility assertions, reader-compatibility validation.

The reference merges two BigQuery TableSchemas field-by-field asserting
type/mode equality on common fields (BigDiffy.mergeFields:549-579) and
validates that the RHS schema can read the LHS for Avro
(BigDiffy.scala:765-772). Both are driver-side StructType walks here —
Spark's own ``mergeSchema`` handles the file-level case; these helpers
enforce the reference's stricter semantics.
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaCompatibilityError(ValueError):
    pass


def get_nested_field(schema: T.StructType, path: str) -> T.StructField:
    """Resolve a '.'-separated field path through nested structs
    (the reference's getAvroField walk, BigSamplerAvro.scala:97-124;
    fieldSep '.' per BigSampler.scala:49)."""
    parts = path.split(".")
    current: T.DataType = schema
    field = None
    for p in parts:
        if not isinstance(current, T.StructType):
            raise SchemaCompatibilityError(
                f"path {path!r}: {p!r} reached non-struct type {current}"
            )
        try:
            field = current[p]
        except KeyError:
            raise SchemaCompatibilityError(f"path {path!r}: no field {p!r}") from None
        current = field.dataType
    assert field is not None
    return T.StructField(path, field.dataType, field.nullable)


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union of fields, order = a's fields then b-only fields (the
    reference's LinkedHashSet ordering, BigDiffy.mergeFields:549-579).
    Common fields must have equal types; nullability is OR-ed; common
    struct fields merge recursively. Type mismatch raises."""
    out: list[T.StructField] = []
    b_map = {f.name: f for f in b.fields}
    seen = set()
    for fa in a.fields:
        fb = b_map.get(fa.name)
        if fb is None:
            out.append(fa)
        else:
            if isinstance(fa.dataType, T.StructType) and isinstance(
                fb.dataType, T.StructType
            ):
                merged = merge_schemas(fa.dataType, fb.dataType)
                out.append(
                    T.StructField(fa.name, merged, fa.nullable or fb.nullable)
                )
            elif fa.dataType != fb.dataType:
                raise SchemaCompatibilityError(
                    f"field {fa.name!r}: type mismatch {fa.dataType} vs {fb.dataType}"
                )
            else:
                out.append(
                    T.StructField(fa.name, fa.dataType, fa.nullable or fb.nullable)
                )
        seen.add(fa.name)
    for fb in b.fields:
        if fb.name not in seen:
            out.append(fb)
    return T.StructType(out)


def assert_can_read(reader: T.StructType, writer: T.StructType) -> None:
    """Reader-compatibility (the Avro canReadStrategy validation,
    BigDiffy.scala:765-772): every reader field must exist in the writer
    with an equal type, or be nullable (fillable with null)."""
    w_map = {f.name: f for f in writer.fields}
    for fr in reader.fields:
        fw = w_map.get(fr.name)
        if fw is None:
            if not fr.nullable:
                raise SchemaCompatibilityError(
                    f"reader field {fr.name!r} missing from writer and not nullable"
                )
            continue
        if isinstance(fr.dataType, T.StructType) and isinstance(
            fw.dataType, T.StructType
        ):
            assert_can_read(fr.dataType, fw.dataType)
        elif fr.dataType != fw.dataType:
            raise SchemaCompatibilityError(
                f"reader field {fr.name!r}: {fr.dataType} cannot read {fw.dataType}"
            )
