"""SPARQL parser: query string → :mod:`aruna_spark.sparql.algebra` AST.

Hand-rolled tokenizer + recursive-descent parser covering the algebra the
reference accepts (``operations/src/metadata/api.rs:1998-2090``): SELECT/ASK
with BGPs, property paths, FILTER (full expression algebra), OPTIONAL,
UNION, MINUS, BIND, VALUES, GRAPH, GROUP BY + SPARQL 1.1 aggregates, HAVING,
ORDER BY, LIMIT/OFFSET, DISTINCT/REDUCED. CONSTRUCT/DESCRIBE and SERVICE are
rejected exactly like the reference (``api.rs:1976-1996`` query-form check;
SERVICE rejection in the algebra walker).

The reference pre-declares common prefixes on every query
(``operations/src/metadata/handle.rs:98-103``); :data:`DEFAULT_PREFIXES`
mirrors that list and user PREFIX declarations override it.
"""

from __future__ import annotations

import re

from aruna_spark.sparql.algebra import (
    AskQuery,
    Bgp,
    ExExists,
    ExFunc,
    ExOp,
    ExTerm,
    ExVar,
    Extend,
    Filter,
    GraphPattern,
    Group,
    Iri,
    Join,
    Lateral,
    LeftJoin,
    Literal,
    Minus,
    OrderCond,
    PathAlternative,
    PathInverse,
    PathIri,
    PathNegated,
    PathOneOrMore,
    PathSequence,
    PathZeroOrMore,
    PathZeroOrOne,
    SelectQuery,
    SubSelect,
    TriplePattern,
    Union,
    Values,
    Var,
)
from aruna_spark.sparql.terms import RDF, RDFS, SCHEMA, XSD

DEFAULT_PREFIXES = {
    "schema": SCHEMA,
    "rdf": RDF,
    "rdfs": RDFS,
    "xsd": XSD,
    "fts": "urn:craqle:fts:",
}

MAX_QUERY_BYTES = 64 * 1024  # handle.rs:94

AGGREGATES = {"COUNT", "SUM", "AVG", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE"}

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<STRING>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<PNAME>[A-Za-z_][A-Za-z0-9_.\-]*?:[A-Za-z0-9_.\-]*)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>\^\^|\|\||&&|!=|<=|>=|[{}()\[\].;,=<>!+\-*/|^?a])
    """,
    re.VERBOSE,
)

_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


class SparqlSyntaxError(ValueError):
    pass


class UnsupportedQueryError(ValueError):
    """Query form / feature the engine (like the reference) rejects."""


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(text: str) -> list[tuple[str, str]]:
    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise SparqlSyntaxError(f"cannot tokenize at: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        toks.append((kind, m.group()))
    toks.append(("EOF", ""))
    return toks


class Parser:
    def __init__(self, text: str):
        if len(text.encode()) > MAX_QUERY_BYTES:
            raise UnsupportedQueryError("query text exceeds 64 KiB")  # handle.rs:94
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes = dict(DEFAULT_PREFIXES)
        self.base: str | None = None
        self._bnode_n = 0

    # ------------------------------------------------------------ helpers
    def peek(self, ahead: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        k, v = self.peek()
        return k in ("NAME", "OP") and v.upper() in kws

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise SparqlSyntaxError(f"expected {kw}, got {self.peek()[1]!r}")
        self.next()

    def at(self, val: str) -> bool:
        return self.peek()[1] == val

    def eat(self, val: str) -> None:
        if not self.at(val):
            raise SparqlSyntaxError(f"expected {val!r}, got {self.peek()[1]!r}")
        self.next()

    def _int_literal(self, clause: str) -> int:
        """Consume a non-negative integer token; anything else is a
        syntax error (the route's 400), never a raw ValueError (found by
        the parser fuzz: ``LIMIT`` followed by a keyword crashed)."""
        tok = self.next()[1]
        try:
            return int(tok)
        except ValueError:
            raise SparqlSyntaxError(
                f"{clause} expects an integer, got {tok!r}"
            ) from None

    def fresh_var(self) -> str:
        self._bnode_n += 1
        return f"__anon{self._bnode_n}"

    # ------------------------------------------------------------- entry
    def parse(self) -> SelectQuery | AskQuery:
        self._prologue()
        if self.at_kw("SELECT"):
            q = self._select_query()
        elif self.at_kw("ASK"):
            q = self._ask_query()
        elif self.at_kw("CONSTRUCT", "DESCRIBE"):
            # the reference accepts SELECT and ASK only (api.rs:1976-1996)
            raise UnsupportedQueryError(f"{self.peek()[1].upper()} queries are not supported")
        else:
            raise SparqlSyntaxError(f"expected SELECT or ASK, got {self.peek()[1]!r}")
        if self.peek()[0] != "EOF":
            raise SparqlSyntaxError(f"trailing input: {self.peek()[1]!r}")
        return q

    def _prologue(self) -> None:
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                k, v = self.next()
                if k != "PNAME" or not v.endswith(":"):
                    # PNAME token includes the local part; a declaration is 'name:'
                    raise SparqlSyntaxError(f"bad PREFIX name {v!r}")
                name = v[:-1]
                ik, iv = self.next()
                if ik != "IRIREF":
                    raise SparqlSyntaxError("PREFIX needs an <iri>")
                self.prefixes[name] = iv[1:-1]
            elif self.at_kw("BASE"):
                self.next()
                ik, iv = self.next()
                if ik != "IRIREF":
                    raise SparqlSyntaxError("BASE needs an <iri>")
                self.base = iv[1:-1]
            else:
                return

    # ------------------------------------------------------------ queries
    def _select_query(self) -> SelectQuery:
        self.eat_kw("SELECT")
        distinct = reduced = False
        if self.at_kw("DISTINCT"):
            distinct = True
            self.next()
        elif self.at_kw("REDUCED"):
            reduced = True
            self.next()

        projection: list[tuple[str, object]] | None
        if self.at("*"):
            self.next()
            projection = None
        else:
            projection = []
            while True:
                k, v = self.peek()
                if k == "VAR":
                    self.next()
                    projection.append((v[1:], None))
                elif self.at("("):
                    self.next()
                    e = self._expression()
                    self.eat_kw("AS")
                    vk, vv = self.next()
                    if vk != "VAR":
                        raise SparqlSyntaxError("expected variable after AS")
                    self.eat(")")
                    projection.append((vv[1:], e))
                else:
                    break
            if not projection:
                raise SparqlSyntaxError("empty SELECT clause")

        if self.at_kw("WHERE"):
            self.next()
        pattern = self._group_graph_pattern()

        group_by: list[tuple[str, object]] = []
        having = None
        order_by: list[OrderCond] = []
        limit = offset = None
        if self.at_kw("GROUP"):
            self.next()
            self.eat_kw("BY")
            while True:
                k, v = self.peek()
                if k == "VAR":
                    self.next()
                    group_by.append((v[1:], None))
                elif self.at("("):
                    self.next()
                    e = self._expression()
                    if self.at_kw("AS"):
                        self.next()
                        vk, vv = self.next()
                        if vk != "VAR":
                            raise SparqlSyntaxError("expected variable after AS")
                        self.eat(")")
                        group_by.append((vv[1:], e))
                    else:
                        self.eat(")")
                        group_by.append((self.fresh_var(), e))
                else:
                    break
            if not group_by:
                raise SparqlSyntaxError("empty GROUP BY")
        if self.at_kw("HAVING"):
            self.next()
            self.eat("(")
            having = self._expression()
            self.eat(")")
        if self.at_kw("ORDER"):
            self.next()
            self.eat_kw("BY")
            while True:
                if self.at_kw("ASC", "DESC"):
                    asc = self.peek()[1].upper() == "ASC"
                    self.next()
                    self.eat("(")
                    e = self._expression()
                    self.eat(")")
                    order_by.append(OrderCond(e, asc))
                elif self.peek()[0] == "VAR":
                    order_by.append(OrderCond(ExVar(self.next()[1][1:]), True))
                elif self.at("("):
                    self.next()
                    e = self._expression()
                    self.eat(")")
                    order_by.append(OrderCond(e, True))
                else:
                    break
            if not order_by:
                raise SparqlSyntaxError("empty ORDER BY")
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.next()
                limit = self._int_literal("LIMIT")
            elif self.at_kw("OFFSET"):
                self.next()
                offset = self._int_literal("OFFSET")
        if self.at_kw("VALUES"):
            self.next()
            pattern = Join(pattern, self._values_block())

        return SelectQuery(
            pattern=pattern,
            projection=tuple(projection) if projection is not None else None,
            distinct=distinct,
            reduced=reduced,
            order_by=tuple(order_by),
            limit=limit,
            offset=offset,
            group_by=tuple(group_by),
            having=having,
        )

    def _ask_query(self) -> AskQuery:
        self.eat_kw("ASK")
        if self.at_kw("WHERE"):
            self.next()
        return AskQuery(self._group_graph_pattern())

    # ----------------------------------------------------------- patterns
    def _group_graph_pattern(self):
        self.eat("{")
        current = None
        filters: list[object] = []

        def merge(pat):
            nonlocal current
            current = pat if current is None else Join(current, pat)

        while not self.at("}"):
            if self.at_kw("OPTIONAL"):
                self.next()
                inner = self._group_graph_pattern()
                expr = None
                if isinstance(inner, Filter):
                    inner, expr = inner.pattern, inner.expr
                current = LeftJoin(current if current is not None else Bgp(()), inner, expr)
            elif self.at_kw("MINUS"):
                self.next()
                inner = self._group_graph_pattern()
                current = Minus(current if current is not None else Bgp(()), inner)
            elif self.at_kw("FILTER"):
                self.next()
                filters.append(self._constraint())
            elif self.at_kw("BIND"):
                self.next()
                self.eat("(")
                e = self._expression()
                self.eat_kw("AS")
                vk, vv = self.next()
                if vk != "VAR":
                    raise SparqlSyntaxError("expected variable after AS")
                self.eat(")")
                current = Extend(current if current is not None else Bgp(()), vv[1:], e)
            elif self.at_kw("VALUES"):
                self.next()
                merge(self._values_block())
            elif self.at_kw("GRAPH"):
                self.next()
                k, v = self.peek()
                if k == "VAR":
                    self.next()
                    gterm = Var(v[1:])
                else:
                    gterm = self._iri()
                merge(GraphPattern(gterm, self._group_graph_pattern()))
            elif self.at_kw("SERVICE"):
                # rejected anywhere in the tree, like api.rs:1998-2090
                raise UnsupportedQueryError("SERVICE is not supported")
            elif self.at_kw("LATERAL"):
                self.next()
                inner = self._group_or_subselect()
                current = Lateral(
                    current if current is not None else Bgp(()), inner
                )
            elif self.at("{"):
                sub = self._group_or_subselect()
                while self.at_kw("UNION"):
                    self.next()
                    sub = Union(sub, self._group_or_subselect())
                merge(sub)
            else:
                merge(self._triples_block())
            if self.at("."):
                self.next()

        self.eat("}")
        result = current if current is not None else Bgp(())
        for f in filters:
            result = Filter(f, result)
        return result

    def _group_or_subselect(self):
        """``{ SELECT ... }`` subselect or a plain group graph pattern."""
        save = self.i
        self.eat("{")
        if self.at_kw("SELECT"):
            q = self._select_query()
            self.eat("}")
            return SubSelect(q)
        self.i = save
        return self._group_graph_pattern()

    def _triples_block(self) -> Bgp:
        patterns: list[TriplePattern] = []
        while True:
            subj = self._var_or_term()
            self._property_list(subj, patterns)
            if self.at("."):
                # lookahead: another triples-same-subject or end of block
                nk, nv = self.peek(1)
                if nv in ("}", "{") or self.at_kw("OPTIONAL"):
                    break
                if nk in ("VAR", "IRIREF", "PNAME", "STRING", "NUMBER") or nv == "a":
                    self.next()
                    continue
                break
            break
        return Bgp(tuple(patterns))

    def _property_list(self, subj, patterns: list[TriplePattern]) -> None:
        while True:
            pred = self._verb()
            while True:
                obj = self._var_or_term()
                patterns.append(TriplePattern(subj, pred, obj))
                if self.at(","):
                    self.next()
                    continue
                break
            if self.at(";"):
                self.next()
                if self.at(".") or self.at("}"):  # dangling ';'
                    break
                continue
            break

    def _verb(self):
        k, v = self.peek()
        if k == "VAR":
            self.next()
            return Var(v[1:])
        return self._path()

    # property paths (subset: iri, ^p, p/q, p|q, p*, p+, p?, !(...))
    def _path(self):
        p = self._path_alternative()
        if isinstance(p, PathIri) and not self._path_was_complex:
            return Iri(p.iri)  # plain predicate
        return p

    def _path_alternative(self):
        self._path_was_complex = False
        parts = [self._path_sequence()]
        while self.at("|"):
            self._path_was_complex = True
            self.next()
            parts.append(self._path_sequence())
        return parts[0] if len(parts) == 1 else PathAlternative(tuple(parts))

    def _path_sequence(self):
        parts = [self._path_elt()]
        while self.at("/"):
            self._path_was_complex = True
            self.next()
            parts.append(self._path_elt())
        return parts[0] if len(parts) == 1 else PathSequence(tuple(parts))

    def _path_elt(self):
        inverse = False
        if self.at("^"):
            self._path_was_complex = True
            inverse = True
            self.next()
        if self.at("!"):
            self._path_was_complex = True
            self.next()
            self.eat("(")
            iris = [self._iri().value]
            while self.at("|"):
                self.next()
                iris.append(self._iri().value)
            self.eat(")")
            p = PathNegated(tuple(iris))
        elif self.at("("):
            self._path_was_complex = True
            self.next()
            p = self._path_alternative()
            self.eat(")")
        else:
            if self.at("a"):
                self.next()
                p = PathIri(RDF + "type")
            else:
                p = PathIri(self._iri().value)
        if self.at("*"):
            self._path_was_complex = True
            self.next()
            p = PathZeroOrMore(p)
        elif self.at("+"):
            self._path_was_complex = True
            self.next()
            p = PathOneOrMore(p)
        elif self.at("?") and self.peek()[0] == "OP":
            self._path_was_complex = True
            self.next()
            p = PathZeroOrOne(p)
        if inverse:
            p = PathInverse(p)
        return p

    def _var_or_term(self):
        k, v = self.peek()
        if k == "VAR":
            self.next()
            return Var(v[1:])
        if k == "IRIREF" or k == "PNAME":
            return self._iri()
        if v == "a":
            raise SparqlSyntaxError("'a' is only valid in predicate position")
        if k == "STRING":
            return self._literal()
        if k == "NUMBER":
            self.next()
            if re.fullmatch(r"[+-]?\d+", v):
                return Literal(v, datatype=XSD + "integer")
            return Literal(v, datatype=XSD + "double")
        if k == "NAME" and v in ("true", "false"):
            self.next()
            return Literal(v, datatype=XSD + "boolean")
        if v == "[":
            self.next()
            self.eat("]")
            return Var(self.fresh_var())
        raise SparqlSyntaxError(f"expected term, got {v!r}")

    def _iri(self) -> Iri:
        k, v = self.next()
        if k == "IRIREF":
            return Iri(v[1:-1])
        if k == "PNAME":
            pre, _, local = v.partition(":")
            if pre not in self.prefixes:
                raise SparqlSyntaxError(f"unknown prefix {pre!r}")
            return Iri(self.prefixes[pre] + local)
        raise SparqlSyntaxError(f"expected IRI, got {v!r}")

    def _literal(self) -> Literal:
        k, v = self.next()
        value = _unescape(v[1:-1])
        nk, nv = self.peek()
        if nk == "LANGTAG":
            self.next()
            return Literal(value, lang=nv[1:].lower())
        if nv == "^^":
            self.next()
            dt = self._iri()
            return Literal(value, datatype=dt.value)
        return Literal(value)

    def _values_block(self) -> Values:
        if self.peek()[0] == "VAR":
            var = self.next()[1][1:]
            self.eat("{")
            rows = []
            while not self.at("}"):
                if self.at_kw("UNDEF"):
                    self.next()
                    rows.append((None,))
                else:
                    rows.append((self._var_or_term(),))
            self.eat("}")
            return Values((var,), tuple(rows))
        self.eat("(")
        vars_: list[str] = []
        while self.peek()[0] == "VAR":
            vars_.append(self.next()[1][1:])
        self.eat(")")
        self.eat("{")
        rows = []
        while self.at("("):
            self.next()
            row = []
            while not self.at(")"):
                if self.at_kw("UNDEF"):
                    self.next()
                    row.append(None)
                else:
                    row.append(self._var_or_term())
            self.eat(")")
            if len(row) != len(vars_):
                raise SparqlSyntaxError("VALUES row arity mismatch")
            rows.append(tuple(row))
        self.eat("}")
        return Values(tuple(vars_), tuple(rows))

    # -------------------------------------------------------- expressions
    def _constraint(self):
        if self.at("("):
            self.next()
            e = self._expression()
            self.eat(")")
            return e
        return self._primary_expression()

    def _expression(self):
        return self._or_expr()

    def _or_expr(self):
        e = self._and_expr()
        while self.at("||"):
            self.next()
            e = ExOp("||", (e, self._and_expr()))
        return e

    def _and_expr(self):
        e = self._rel_expr()
        while self.at("&&"):
            self.next()
            e = ExOp("&&", (e, self._rel_expr()))
        return e

    def _rel_expr(self):
        e = self._add_expr()
        k, v = self.peek()
        if v in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            return ExOp(v, (e, self._add_expr()))
        if self.at_kw("IN"):
            self.next()
            return ExOp("IN", (e, *self._expr_list()))
        if self.at_kw("NOT"):
            self.next()
            self.eat_kw("IN")
            return ExOp("NOTIN", (e, *self._expr_list()))
        return e

    def _expr_list(self):
        self.eat("(")
        out = []
        if not self.at(")"):
            out.append(self._expression())
            while self.at(","):
                self.next()
                out.append(self._expression())
        self.eat(")")
        return tuple(out)

    def _add_expr(self):
        e = self._mul_expr()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            e = ExOp(op, (e, self._mul_expr()))
        return e

    def _mul_expr(self):
        e = self._unary_expr()
        while self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            e = ExOp(op, (e, self._unary_expr()))
        return e

    def _unary_expr(self):
        v = self.peek()[1]
        if v == "!":
            self.next()
            return ExOp("!u", (self._unary_expr(),))
        if v == "-":
            self.next()
            return ExOp("-u", (self._unary_expr(),))
        if v == "+":
            self.next()
            return ExOp("+u", (self._unary_expr(),))
        return self._primary_expression()

    def _primary_expression(self):
        k, v = self.peek()
        if v == "(":
            self.next()
            e = self._expression()
            self.eat(")")
            return e
        if k == "VAR":
            self.next()
            return ExVar(v[1:])
        if k == "STRING":
            return ExTerm(self._literal())
        if k == "NUMBER" or (k == "NAME" and v in ("true", "false")):
            return ExTerm(self._var_or_term())
        if k == "NAME":
            upper = v.upper()
            if upper == "EXISTS":
                self.next()
                return ExExists(self._group_graph_pattern())
            if upper == "NOT":
                self.next()
                self.eat_kw("EXISTS")
                return ExExists(self._group_graph_pattern(), negated=True)
            if upper in AGGREGATES:
                return self._aggregate(upper)
            # builtin function call
            self.next()
            args = self._expr_list() if self.at("(") else ()
            return ExFunc(upper, tuple(args))
        if k in ("IRIREF", "PNAME"):
            iri = self._iri()
            if self.at("("):  # typed-cast function call, e.g. xsd:integer(?x)
                args = self._expr_list()
                return ExFunc(iri.value, tuple(args))
            return ExTerm(iri)
        raise SparqlSyntaxError(f"expected expression, got {v!r}")

    def _aggregate(self, name: str) -> ExFunc:
        self.next()
        self.eat("(")
        distinct = False
        if self.at_kw("DISTINCT"):
            distinct = True
            self.next()
        if name == "COUNT" and self.at("*"):
            self.next()
            self.eat(")")
            return ExFunc("COUNT", (), distinct=distinct)
        arg = self._expression()
        separator = None
        if self.at(";"):
            self.next()
            sk, sv = self.next()  # SEPARATOR
            if sk != "NAME" or sv.upper() != "SEPARATOR":
                raise SparqlSyntaxError("expected SEPARATOR in GROUP_CONCAT")
            self.eat("=")
            lit = self._literal()
            separator = lit.value
        self.eat(")")
        return ExFunc(name, (arg,), distinct=distinct, separator=separator)


def parse(text: str) -> SelectQuery | AskQuery:
    """Parse a SPARQL SELECT/ASK query into the algebra AST."""
    return Parser(text).parse()
