"""SPARQL algebra AST — the parser's output, the compiler's input.

Node set mirrors the algebra the reference accepts
(``operations/src/metadata/api.rs:1998-2090``): Bgp, Path, Join, LeftJoin,
Filter, Union, Minus, Extend, Values, Graph, Group, Project, Distinct,
Reduced, OrderBy, Slice, plus the expression algebra (Or And Equal
SameTerm Greater GreaterOrEqual Less LessOrEqual Add Subtract Multiply
Divide In UnaryPlus UnaryMinus Not If Coalesce FunctionCall Exists Bound).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- terms
@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Literal:
    value: str
    datatype: str | None = None
    lang: str | None = None


@dataclass(frozen=True)
class BlankNode:
    label: str


Term = Var | Iri | Literal | BlankNode


# ---------------------------------------------------------------- paths
@dataclass(frozen=True)
class PathIri:
    iri: str


@dataclass(frozen=True)
class PathInverse:
    inner: "Path"


@dataclass(frozen=True)
class PathSequence:
    parts: tuple


@dataclass(frozen=True)
class PathAlternative:
    parts: tuple


@dataclass(frozen=True)
class PathZeroOrMore:
    inner: "Path"


@dataclass(frozen=True)
class PathOneOrMore:
    inner: "Path"


@dataclass(frozen=True)
class PathZeroOrOne:
    inner: "Path"


@dataclass(frozen=True)
class PathNegated:
    """Negated property set: !(iri1|iri2|...)."""

    iris: tuple


Path = (
    PathIri
    | PathInverse
    | PathSequence
    | PathAlternative
    | PathZeroOrMore
    | PathOneOrMore
    | PathZeroOrOne
    | PathNegated
)


# ----------------------------------------------------------- expressions
@dataclass(frozen=True)
class ExVar:
    name: str


@dataclass(frozen=True)
class ExTerm:
    term: Term


@dataclass(frozen=True)
class ExOp:
    """Binary/unary operator: || && = != < <= > >= + - * / !u -u +u IN NOTIN"""

    op: str
    args: tuple


@dataclass(frozen=True)
class ExFunc:
    """Built-in or aggregate function call."""

    name: str
    args: tuple
    distinct: bool = False
    separator: str | None = None  # GROUP_CONCAT


@dataclass(frozen=True)
class ExExists:
    pattern: "Pattern"
    negated: bool = False


Expr = ExVar | ExTerm | ExOp | ExFunc | ExExists


# -------------------------------------------------------------- patterns
@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term | Path
    o: Term


@dataclass(frozen=True)
class Bgp:
    patterns: tuple


@dataclass(frozen=True)
class Join:
    left: "Pattern"
    right: "Pattern"


@dataclass(frozen=True)
class LeftJoin:
    left: "Pattern"
    right: "Pattern"
    expr: Expr | None = None


@dataclass(frozen=True)
class Filter:
    expr: Expr
    pattern: "Pattern"


@dataclass(frozen=True)
class Union:
    left: "Pattern"
    right: "Pattern"


@dataclass(frozen=True)
class Minus:
    left: "Pattern"
    right: "Pattern"


@dataclass(frozen=True)
class Extend:
    pattern: "Pattern"
    var: str
    expr: Expr


@dataclass(frozen=True)
class Values:
    variables: tuple
    rows: tuple  # tuple of tuples of (Term | None)


@dataclass(frozen=True)
class GraphPattern:
    graph: Term  # Var or Iri
    pattern: "Pattern"


@dataclass(frozen=True)
class Group:
    pattern: "Pattern"
    group_exprs: tuple  # tuple[(str varname, Expr | None)] — (var, expr) for GROUP BY (expr AS ?v)
    aggregates: tuple  # tuple[(str varname, ExFunc)]
    having: Expr | None = None


@dataclass(frozen=True)
class SubSelect:
    query: "SelectQuery"


@dataclass(frozen=True)
class Lateral:
    """Correlated evaluation: right runs once per left solution
    (api.rs:2044 accepts spargebra's Lateral)."""

    left: "Pattern"
    right: "Pattern"


Pattern = (
    Bgp
    | Join
    | LeftJoin
    | Filter
    | Union
    | Minus
    | Extend
    | Values
    | GraphPattern
    | Group
    | SubSelect
    | Lateral
)


# --------------------------------------------------------------- queries
@dataclass(frozen=True)
class OrderCond:
    expr: Expr
    ascending: bool = True


@dataclass
class SelectQuery:
    pattern: Pattern
    projection: tuple | None  # tuple[(varname, Expr|None)] or None for SELECT *
    distinct: bool = False
    reduced: bool = False
    order_by: tuple = field(default_factory=tuple)
    limit: int | None = None
    offset: int | None = None
    group_by: tuple = field(default_factory=tuple)  # [(varname, Expr|None)]
    having: Expr | None = None


@dataclass
class AskQuery:
    pattern: Pattern


Query = SelectQuery | AskQuery
