"""RDF term encoding for DataFrame columns.

A SPARQL solution binding is a mapping var → RDF term; an RDF term is an
IRI, blank node, or literal (lexical form + datatype + optional language
tag). We encode one binding variable as ONE struct column::

    struct<kind: string, value: string, datatype: string, lang: string>

kind ∈ {'iri', 'bnode', 'literal'}; datatype/lang are null except for
literals. An unbound variable is a NULL struct. Struct equality is exactly
RDF *term* equality, so BGP joins are plain struct equi-joins and stay
inside whole-stage codegen.

Literal typing rules mirror the reference's JSON-LD projection
(``operations/src/metadata/handle.rs:3723-3796``): JSON ints →
xsd:integer, floats → xsd:double, bools → xsd:boolean, plain strings →
simple literals, ``@language`` → language-tagged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
SCHEMA = "http://schema.org/"

XSD_INTEGER = XSD + "integer"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_FLOAT = XSD + "float"
XSD_BOOLEAN = XSD + "boolean"
XSD_STRING = XSD + "string"
XSD_DATETIME = XSD + "dateTime"
XSD_DATE = XSD + "date"

NUMERIC_DATATYPES = (XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE, XSD_FLOAT,
                     XSD + "long", XSD + "int", XSD + "short", XSD + "byte",
                     XSD + "nonNegativeInteger", XSD + "positiveInteger",
                     XSD + "unsignedLong", XSD + "unsignedInt")

TERM_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("value", StringType()),
        StructField("datatype", StringType()),
        StructField("lang", StringType()),
    ]
)


def term(kind: Column, value: Column, datatype: Column | None = None, lang: Column | None = None) -> Column:
    """Assemble a term struct column."""
    return F.struct(
        kind.alias("kind"),
        value.alias("value"),
        (datatype if datatype is not None else F.lit(None).cast("string")).alias("datatype"),
        (lang if lang is not None else F.lit(None).cast("string")).alias("lang"),
    )


def iri_term(value: Column) -> Column:
    return term(F.lit("iri"), value)


def node_term(value: Column) -> Column:
    """IRI-or-bnode term from a bare string (bnodes start with ``_:``)."""
    return term(
        F.when(value.startswith("_:"), F.lit("bnode")).otherwise(F.lit("iri")),
        value,
    )


def literal_term(value: Column, datatype: Column | None = None, lang: Column | None = None) -> Column:
    return term(F.lit("literal"), value, datatype, lang)


def null_term() -> Column:
    return F.lit(None).cast(TERM_SCHEMA)


def is_numeric_literal(t: Column) -> Column:
    return (t["kind"] == "literal") & t["datatype"].isin(*NUMERIC_DATATYPES)


def numeric_value(t: Column) -> Column:
    """Numeric value-space projection (double) — null if not numeric.

    ``try_cast``, not ``cast``: Spark 4 runs ANSI mode, where casting a
    malformed lexical form (e.g. ``''^^xsd:integer``) throws and kills
    the whole query. SPARQL 17.3 makes a malformed numeric a TYPE ERROR
    on that binding only — null here, so comparisons fall back to term
    equality / lexical compare (found by the hypothesis compare suite).
    """
    return F.when(is_numeric_literal(t), t["value"].try_cast("double"))


def boolean_value(t: Column) -> Column:
    return F.when(
        (t["kind"] == "literal") & (t["datatype"] == XSD_BOOLEAN),
        t["value"] == "true",
    )


def datetime_value(t: Column) -> Column:
    return F.when(
        (t["kind"] == "literal") & t["datatype"].isin(XSD_DATETIME, XSD_DATE),
        # try_to_timestamp: malformed datetime lexical forms are a
        # per-binding type error (null), never an ANSI-mode query crash
        F.try_to_timestamp(t["value"].substr(F.lit(1), F.length(t["value"]))),
    )


def effective_boolean_value(t: Column) -> Column:
    """EBV per SPARQL 17.2.2: booleans as-is; numbers ≠ 0; strings non-empty."""
    return (
        F.when((t["datatype"] == XSD_BOOLEAN), t["value"] == "true")
        .when(is_numeric_literal(t), t["value"].try_cast("double") != 0.0)
        .when(
            (t["kind"] == "literal") & (t["datatype"].isNull() | (t["datatype"] == XSD_STRING)),
            F.length(t["value"]) > 0,
        )
        .otherwise(F.lit(None).cast("boolean"))
    )


def sort_key_columns(t: Column) -> list[Column]:
    """Total-order sort key approximating SPARQL ORDER BY semantics:
    unbound < bnode < iri < literal; numerics by value, then strings."""
    kind_rank = (
        F.when(t.isNull(), 0)
        .when(t["kind"] == "bnode", 1)
        .when(t["kind"] == "iri", 2)
        .otherwise(3)
    )
    return [kind_rank, numeric_value(t), datetime_value(t), t["value"]]
