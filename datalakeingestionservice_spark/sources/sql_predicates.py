"""Compile the simple-SQL predicate subset to pyarrow compute.

Merge-on-read deferred deletes (`VersionedTable.delete_where_deferred`,
`sinks/versioned.py`) record arbitrary Spark-SQL boolean predicates in the
manifest. Spark-session readers evaluate them with `F.expr`; the
sessionless batch DataSource workers (`sources/versioned_batch.py`) cannot
— so this module compiles the subset that covers real delete predicates
(column-vs-literal AND column-vs-column comparisons incl. the
null-safe `<=>`, AND / OR / NOT, IS [NOT] NULL, [NOT] IN,
[NOT] BETWEEN, [NOT] LIKE, column-side arithmetic `col * 2 > 10`
including column-vs-column `a + b > c`, unary
length/lower/upper/trim/abs, string builders concat/substring/coalesce,
CASE WHEN operands (full boolean grammar in branch predicates),
struct-field access `s.x = 1`, parentheses) into a JSON-serializable AST
on the driver and evaluates it executor-side with pyarrow.compute using
SQL three-valued logic (Kleene AND/OR, null-propagating comparisons),
matching Spark's `filter(~expr(pred))` semantics exactly: a row whose
predicate evaluates to TRUE **or NULL** is deleted (the keep-mask
NOT(pred) is NULL, and the arrow filter drops NULL-mask rows, exactly
like Spark's filter). Arithmetic runs in int64/double: values agree with
Spark wherever Spark's 32-bit ANSI math doesn't itself raise on
overflow (where Spark would fail the whole job, this path returns the
mathematically correct comparison instead).

Predicates outside the subset fail `parse_predicate` driver-side, where
the DataSource surfaces its documented refusal (read via
`VersionedTable.read()` or `compact()` first) — never a wrong answer.

Reference anchor: the reference pushes row filtering into its SQL sources
as WHERE clauses inside the configured statements
(`src/Infrastructure/DataExtraction/SqlServerDataSource.cs:20-73`); this
is the lake-native equivalent for an engine whose "server" is a manifest
plus parquet.
"""

from __future__ import annotations

import datetime as _dt
import re
from decimal import Decimal


class UnsupportedPredicateError(ValueError):
    """Raised when a predicate falls outside the compilable subset."""


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<bquote>`[^`]+`(?:\.`[^`]+`)*)
      | (?P<number>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=>|<=|>=|<>|!=|==|=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<minus>-)
      | (?P<arith>[+*/])
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN",
    "TRUE", "FALSE", "DATE", "TIMESTAMP", "LIKE",
    "CASE", "WHEN", "THEN", "ELSE", "END",
}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(sql):
        mobj = _TOKEN_RE.match(sql, pos)
        if mobj is None or mobj.end() == pos:
            rest = sql[pos:].strip()
            if not rest:
                break
            raise UnsupportedPredicateError(
                f"cannot tokenize predicate at: {rest[:40]!r}"
            )
        pos = mobj.end()
        kind = mobj.lastgroup
        text = mobj.group(kind)
        if kind == "word":
            up = text.upper()
            if up in _KEYWORDS:
                out.append((up, up))
            else:
                out.append(("ident", text))
        elif kind == "bquote":
            out.append(("ident", text.replace("`", "")))
        elif kind == "string":
            out.append(("str", text[1:-1].replace("''", "'")))
        else:
            out.append((kind, text))
    return out


class _Parser:
    """Recursive descent over the token stream. AST nodes are plain
    lists (picklable, JSON-able):

      ["cmp", op, colx, lit]     op in = != < <= > >=
      ["and"|"or", left, right]  ["not", x]
      ["isnull", colx]  ["notnull", colx]
      ["in", colx, [lit, ...]]
      ["like", colx, pattern]    SQL LIKE (%, _, backslash escape)

      ["cmpc", op, colx, colx]   column-vs-column comparison

    where colx (a column EXPRESSION) is a column name — possibly dotted
    for struct-field access (`s.x`) — or column-side arithmetic
    ["arith", aop, colx, rhs] with aop in + - * / and rhs a numeric
    literal (`price * 2 > 10`) or ["c", colx] for column-vs-column
    math (`a + b > c`), or a unary function ["fn", name, colx] with
    name in length / lower / upper / trim / abs, or a string builder:
    ["substr", colx, pos, len|None] (1-based, like Spark),
    ["concat", [arg, ...]] / ["coalesce", [arg, ...]] where each arg
    is ["c", colx] or a literal. lit is ["s", str] | ["n", text] |
    ["d", iso] | ["t", iso] | ["b", bool]. Number literals keep their
    TEXT so decimal comparisons stay exact."""

    _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "!=": "!="}

    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise UnsupportedPredicateError("unexpected end of predicate")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise UnsupportedPredicateError(f"expected {kind}, got {v!r}")
        return v

    def parse(self) -> list:
        ast = self.or_expr()
        if self.i != len(self.toks):
            raise UnsupportedPredicateError(
                f"trailing tokens: {self.toks[self.i][1]!r}"
            )
        return ast

    def or_expr(self) -> list:
        left = self.and_expr()
        while self.peek() == "OR":
            self.next()
            left = ["or", left, self.and_expr()]
        return left

    def and_expr(self) -> list:
        left = self.unary()
        while self.peek() == "AND":
            self.next()
            left = ["and", left, self.unary()]
        return left

    def unary(self) -> list:
        if self.peek() == "NOT":
            self.next()
            return ["not", self.unary()]
        if self.peek() == "lparen":
            # Parenthesized boolean expr — but '(' can't start a
            # comparison operand in this subset (no arithmetic), so
            # recurse unambiguously.
            self.next()
            inner = self.or_expr()
            self.expect("rparen")
            return inner
        return self.predicate()

    def _literal(self) -> list:
        k, v = self.next()
        if k == "str":
            return ["s", v]
        if k == "number":
            return ["n", v]
        if k == "minus":
            return ["n", "-" + self.expect("number")]
        if k in ("TRUE", "FALSE"):
            return ["b", k == "TRUE"]
        if k == "DATE":
            return ["d", self.expect("str")]
        if k == "TIMESTAMP":
            return ["t", self.expect("str")]
        raise UnsupportedPredicateError(f"expected literal, got {v!r}")

    def _arg(self) -> list:
        """One function argument: ["c", colx] or a literal node."""
        k, v = self._operand()
        return ["c", v] if k == "col" else v

    def _fncall(self, fn: str) -> list:
        """Parse a supported function call; '(' already peeked."""
        name = fn.lower()
        self.next()  # lparen
        if name in _FUNCS:
            inner, iv = self._operand()
            if inner != "col":
                raise UnsupportedPredicateError(
                    f"{fn}() takes a column argument"
                )
            self.expect("rparen")
            return ["fn", name, iv]
        if name in ("substring", "substr"):
            inner, iv = self._operand()
            if inner != "col":
                raise UnsupportedPredicateError(
                    "substring() takes a column first argument"
                )
            self.expect("comma")
            pos = self._literal()
            ln = None
            if self.peek() == "comma":
                self.next()
                ln = self._literal()
            self.expect("rparen")
            if pos[0] != "n" or (ln is not None and ln[0] != "n"):
                raise UnsupportedPredicateError(
                    "substring() position/length must be integer literals"
                )
            try:
                posi = int(pos[1])
                lni = None if ln is None else int(ln[1])
            except ValueError:
                raise UnsupportedPredicateError(
                    "substring() position/length must be integers"
                )
            if posi < 1 or (lni is not None and lni < 0):
                # Spark allows 0/negative positions with from-the-end
                # semantics pyarrow's slice can't mirror near the string
                # boundary — refuse rather than risk divergence.
                raise UnsupportedPredicateError(
                    "substring() supports 1-based positive positions "
                    "and non-negative lengths only"
                )
            return ["substr", iv, posi, lni]
        if name in ("concat", "coalesce"):
            args = [self._arg()]
            while self.peek() == "comma":
                self.next()
                args.append(self._arg())
            self.expect("rparen")
            if len(args) < 2:
                raise UnsupportedPredicateError(
                    f"{name}() needs at least two arguments"
                )
            return [name, args]
        raise UnsupportedPredicateError(
            f"unsupported function {fn!r} (supported: "
            f"{sorted(_FUNCS | {'substring', 'concat', 'coalesce'})})"
        )

    def _case(self) -> list:
        """CASE WHEN <bool> THEN <arg> ... [ELSE <arg>] END — the
        branch predicates use the FULL boolean grammar; branch values
        are ["c", colx] or literals. Spark semantics: a branch fires on
        TRUE only (NULL falls through); no ELSE => NULL result."""
        self.next()  # CASE
        branches: list = []
        while self.peek() == "WHEN":
            self.next()
            pred = self.or_expr()
            self.expect("THEN")
            branches.append([pred, self._arg()])
        if not branches:
            raise UnsupportedPredicateError("CASE needs WHEN branches")
        els = None
        if self.peek() == "ELSE":
            self.next()
            els = self._arg()
        self.expect("END")
        return ["case", branches, els]

    def _operand(self) -> tuple[str, object]:
        """Returns ("col", colx) or ("lit", lit); a column may chain
        LEFT-side arithmetic with numeric literals or columns
        (`price * 2`, `a + b - 3`) — evaluated left-to-right, no
        precedence (refuse mixed +/* chains rather than mis-parse
        them)."""
        if self.peek() == "CASE":
            return ("col", self._case())
        if self.peek() != "ident":
            return ("lit", self._literal())
        colx: object = self.next()[1]
        if self.peek() == "lparen":
            colx = self._fncall(colx)
        seen_ops = set()
        while self.peek() in ("arith", "minus"):
            kind, text = self.next()
            aop = "-" if kind == "minus" else text
            seen_ops.add("*/" if aop in "*/" else "+-")
            if len(seen_ops) > 1:
                raise UnsupportedPredicateError(
                    "mixed +/- and */ arithmetic needs parentheses; "
                    "outside this subset"
                )
            if self.peek() == "ident":
                rname = self.next()[1]
                rhs: list = ["c", rname]
                if self.peek() == "lparen":
                    rhs = ["c", self._fncall(rname)]
            else:
                lit = self._literal()
                if lit[0] != "n":
                    raise UnsupportedPredicateError(
                        "column arithmetic takes numeric literals or "
                        "columns only"
                    )
                rhs = lit
            colx = ["arith", aop, colx, rhs]
        return ("col", colx)

    def predicate(self) -> list:
        lk, lv = self._operand()
        k = self.peek()
        if lk == "col" and k in (None, "AND", "OR", "rparen", "THEN"):
            # Bare boolean column (`flag`, `NOT flag`, `CASE WHEN flag
            # THEN ...`): desugar to `flag = TRUE` — identical under
            # three-valued logic.
            return ["cmp", "=", lv, ["b", True]]
        if k == "IS":
            self.next()
            if lk != "col":
                raise UnsupportedPredicateError("IS NULL needs a column")
            if self.peek() == "NOT":
                self.next()
                self.expect("NULL")
                return ["notnull", lv]
            self.expect("NULL")
            return ["isnull", lv]
        negate = False
        if k == "NOT":
            self.next()
            negate = True
            k = self.peek()
        if k == "LIKE":
            self.next()
            pat = self._literal()
            if lk != "col" or pat[0] != "s":
                raise UnsupportedPredicateError(
                    "LIKE needs a column left side and a string pattern"
                )
            node = ["like", lv, pat[1]]
            return ["not", node] if negate else node
        if k == "IN":
            self.next()
            if lk != "col":
                raise UnsupportedPredicateError("IN needs a column left side")
            self.expect("lparen")
            lits = [self._literal()]
            while self.peek() == "comma":
                self.next()
                lits.append(self._literal())
            self.expect("rparen")
            node = ["in", lv, lits]
            return ["not", node] if negate else node
        if k == "BETWEEN":
            self.next()
            if lk != "col":
                raise UnsupportedPredicateError(
                    "BETWEEN needs a column left side"
                )
            lo = self._literal()
            self.expect("AND")
            hi = self._literal()
            node = [
                "and",
                ["cmp", ">=", lv, lo],
                ["cmp", "<=", lv, hi],
            ]
            return ["not", node] if negate else node
        if negate:
            raise UnsupportedPredicateError("dangling NOT before comparison")
        if k != "op":
            got = self.toks[self.i][1] if self.i < len(self.toks) else "<end>"
            raise UnsupportedPredicateError(f"expected operator, got {got!r}")
        op = self.next()[1]
        op = {"==": "=", "<>": "!="}.get(op, op)
        rk, rv = self._operand()
        if op == "<=>":
            # Null-safe equality (Spark's <=>): symmetric, never NULL.
            if lk == "col" and rk == "lit":
                return ["eqns", lv, rv]
            if lk == "lit" and rk == "col":
                return ["eqns", rv, lv]
            if lk == "col" and rk == "col":
                return ["eqnsc", lv, rv]
            raise UnsupportedPredicateError(
                "<=> needs at least one column side"
            )
        if lk == "col" and rk == "lit":
            return ["cmp", op, lv, rv]
        if lk == "lit" and rk == "col":
            return ["cmp", self._FLIP[op], rv, lv]
        if lk == "col" and rk == "col":
            return ["cmpc", op, lv, rv]
        raise UnsupportedPredicateError(
            "comparisons need at least one column side"
        )


def parse_predicate(sql: str) -> list:
    """Parse `sql` into the AST, or raise UnsupportedPredicateError."""
    toks = _tokenize(sql)
    if not toks:
        raise UnsupportedPredicateError("empty predicate")
    return _Parser(toks).parse()


_NUMERIC = {
    "tinyint", "smallint", "int", "bigint", "float", "double",
}
_INTISH = {"tinyint", "smallint", "int", "bigint"}
#: Unary column functions with exact pyarrow twins (Spark parity: the
#: battery pins each — length counts codepoints, trim strips SPACES
#: only, lower/upper are unicode-aware, abs on int64/double).
_FUNCS = {"length", "lower", "upper", "trim", "abs"}


def _cmp_cat(t: str) -> str:
    """Comparison category of a simpleString type (types in one
    category compare exactly the same way in Spark and arrow)."""
    if t in _NUMERIC:
        return "num"
    if t == "string" or t.startswith(("varchar", "char")):
        return "str"
    if t.startswith("decimal"):
        return "dec:" + t  # exact-type match only
    if t == "date" or t.startswith("timestamp"):
        return "temporal"
    if t == "boolean":
        return "bool"
    return "other:" + t


def _val_cat(t: str) -> str:
    """VALUE category — for contexts that PRODUCE a value (CASE /
    COALESCE branches) rather than merely compare. Stricter than
    _cmp_cat on temporals: the arrow evaluator coerces branch arrays to
    the first array's type, so a date column mixed with a timestamp
    column would truncate time-of-day (timestamp->date32) where the
    Spark twin promotes to timestamp — the two MoR readers would
    disagree. Exact temporal type required (date vs timestamp vs
    timestamp_ntz all distinct), like the decimal exact-type rule."""
    cat = _cmp_cat(t)
    if cat == "temporal":
        return "tmp:" + ("date" if t == "date" else t)
    return cat


def _split_top(s: str) -> list[str]:
    """Split a struct body on commas OUTSIDE <> / () nesting."""
    out, depth, tok = [], 0, []
    for ch in s:
        depth += ch in "<("
        depth -= ch in ">)"
        if ch == "," and depth == 0:
            out.append("".join(tok))
            tok = []
        else:
            tok.append(ch)
    if tok:
        out.append("".join(tok))
    return out


def _struct_field_type(struct_simple: str, field: str) -> str | None:
    """Field type inside a `struct<a:int,b:...>` simpleString, None when
    absent (sessionless text parsing, nesting-aware)."""
    if not (
        struct_simple.startswith("struct<") and struct_simple.endswith(">")
    ):
        return None
    for part in _split_top(struct_simple[len("struct<"):-1]):
        name, _, t = part.partition(":")
        if name == field:
            return t
    return None


def check_supported(ast: list, types: dict[str, str]) -> None:
    """Driver-side validation: every referenced column exists and its
    Spark simpleString type is comparable with the literal the way the
    arrow evaluation will compare them. Raises UnsupportedPredicateError
    so the DataSource can surface its documented refusal BEFORE planning
    (never a wrong answer executor-side)."""

    def base_type(c: str) -> str:
        """Type of a (possibly dotted, struct-field) column name."""
        if c in types:
            return types[c]
        if "." in c:
            head, *rest = c.split(".")
            t = types.get(head)
            for f in rest:
                if t is None:
                    break
                t = _struct_field_type(t, f)
            if t is not None:
                return t
        raise UnsupportedPredicateError(f"unknown column {c!r}")

    def col_type(cx) -> str:
        """Type a colx expression; validates arithmetic along the way."""
        if isinstance(cx, str):
            return base_type(cx)
        if cx[0] == "fn":
            t = col_type(cx[2])
            stringy = t == "string" or t.startswith(("varchar", "char"))
            if cx[1] == "length":
                if not stringy:
                    raise UnsupportedPredicateError(
                        f"length() needs a string column, got {t}"
                    )
                return "int"
            if cx[1] in ("lower", "upper", "trim"):
                if not stringy:
                    raise UnsupportedPredicateError(
                        f"{cx[1]}() needs a string column, got {t}"
                    )
                return "string"
            # abs
            if t not in _NUMERIC:
                raise UnsupportedPredicateError(
                    f"abs() needs a numeric column, got {t}"
                )
            return "double" if t in ("float", "double") else "bigint"
        if cx[0] == "arith":
            t = col_type(cx[2])
            rhs = cx[3]
            if t not in _NUMERIC:
                raise UnsupportedPredicateError(
                    f"arithmetic needs a numeric column, got {t}"
                    " (decimal arithmetic is outside this subset)"
                )
            if rhs[0] == "c":
                rt = col_type(rhs[1])
                if rt not in _NUMERIC:
                    raise UnsupportedPredicateError(
                        f"arithmetic needs numeric columns, got {rt}"
                    )
                # Column-side divisor may be zero at runtime: Spark ANSI
                # raises there too, but pyarrow's divide yields inf/nan —
                # divide only by literals in this subset.
                if cx[1] == "/":
                    raise UnsupportedPredicateError(
                        "column-by-column division is outside this "
                        "subset (divisor could be zero)"
                    )
                if t in ("float", "double") or rt in ("float", "double"):
                    return "double"
                return "bigint"
            ltext = rhs[1]
            if cx[1] == "/" and float(ltext) == 0.0:
                raise UnsupportedPredicateError(
                    "division by literal zero (Spark ANSI errors; refuse"
                    " driver-side)"
                )
            frac = "." in ltext or "e" in ltext.lower()
            if cx[1] == "/" or frac or t in ("float", "double"):
                return "double"
            return "bigint"
        if cx[0] == "substr":
            t = col_type(cx[1])
            if not (t == "string" or t.startswith(("varchar", "char"))):
                raise UnsupportedPredicateError(
                    f"substring() needs a string column, got {t}"
                )
            return "string"
        if cx[0] == "concat":
            for a in cx[1]:
                if a[0] == "c":
                    at = col_type(a[1])
                    if not (
                        at == "string"
                        or at.startswith(("varchar", "char"))
                    ):
                        raise UnsupportedPredicateError(
                            f"concat() needs string arguments, got {at}"
                        )
                elif a[0] != "s":
                    raise UnsupportedPredicateError(
                        "concat() literal arguments must be strings"
                    )
            return "string"
        if cx[0] == "case":
            branches, els = cx[1], cx[2]
            args = [a for _p, a in branches] + (
                [els] if els is not None else []
            )
            for p, _a in branches:
                walk(p)  # branch predicates validate like any other
            first_c: str | None = None
            for a in args:
                if a[0] == "c":
                    at = col_type(a[1])
                    if first_c is None:
                        first_c = at
                    elif _val_cat(first_c) != _val_cat(at):
                        raise UnsupportedPredicateError(
                            f"CASE mixes {first_c} with {at}"
                        )
            if first_c is None:
                raise UnsupportedPredicateError(
                    "CASE needs at least one column-valued branch "
                    "(an all-literal CASE is a constant)"
                )
            lit_tag_type = {
                "s": "string",
                "n": first_c if first_c in _NUMERIC else "double",
                # A TIMESTAMP literal is compatible with EITHER timestamp
                # flavor (the arrow side parses it naive) — only the
                # date-vs-timestamp mix is the truncation hazard.
                "d": "date",
                "t": first_c
                if first_c.startswith("timestamp")
                else "timestamp",
                "b": "boolean",
            }
            for a in args:
                if a[0] != "c" and _val_cat(
                    lit_tag_type.get(a[0], "?")
                ) != _val_cat(first_c):
                    raise UnsupportedPredicateError(
                        f"CASE literal {a!r} incompatible with {first_c}"
                    )
            # Numeric CASE promotes like Spark: any floating branch (or
            # fractional literal) makes the result double.
            if first_c in _NUMERIC:
                floaty = any(
                    (
                        a[0] == "c"
                        and col_type(a[1]) in ("float", "double")
                    )
                    or (
                        a[0] == "n"
                        and ("." in a[1] or "e" in a[1].lower())
                    )
                    for a in args
                )
                return "double" if floaty else "bigint"
            return first_c
        if cx[0] == "coalesce":
            first: str | None = None
            for a in cx[1]:
                if a[0] == "c":
                    at = col_type(a[1])
                    if first is None:
                        first = at
                    elif _val_cat(first) != _val_cat(at):
                        raise UnsupportedPredicateError(
                            f"coalesce() mixes {first} with {at}"
                        )
            if first is None:
                raise UnsupportedPredicateError(
                    "coalesce() needs at least one column argument"
                )
            lit_tag_type = {
                "s": "string", "n": first if first in _NUMERIC
                else "double", "d": "date",
                "t": first
                if first.startswith("timestamp")
                else "timestamp",
                "b": "boolean",
            }
            for a in cx[1]:
                if a[0] != "c" and _val_cat(
                    lit_tag_type.get(a[0], "?")
                ) != _val_cat(first):
                    raise UnsupportedPredicateError(
                        f"coalesce() literal {a!r} incompatible with "
                        f"{first}"
                    )
            return first
        raise UnsupportedPredicateError(f"unknown column expr {cx!r}")

    def lit_ok(t: str, lit: list) -> bool:
        tag = lit[0]
        if t.startswith("decimal"):
            # A literal whose scale exceeds the column's would pass here
            # but raise ArrowInvalid (rescale data loss) executor-side in
            # `_scalar_for` — refuse driver-side instead, keeping the
            # module's "refusal driver-side, never executor-side"
            # contract. Same for integer digits beyond the precision.
            if tag != "n":
                return False
            mm = re.match(r"decimal\((\d+),(\d+)\)", t)
            if mm:
                prec, scale = int(mm.group(1)), int(mm.group(2))
                d = Decimal(lit[1])
                exp = d.as_tuple().exponent
                if isinstance(exp, int):
                    if max(0, -exp) > scale:
                        return False
                    # digits left of the point must fit precision-scale
                    if d.adjusted() + 1 > prec - scale:
                        return False
            return True
        if t in _NUMERIC:
            return tag == "n"
        if t in ("string",) or t.startswith(("varchar", "char")):
            return tag == "s"
        if t == "date":
            if tag == "d":
                return True
            if tag == "s":
                try:
                    _dt.date.fromisoformat(lit[1])
                    return True
                except ValueError:
                    return False
            return False
        if t.startswith("timestamp"):
            # "d" allowed: Spark coerces a DATE literal against a
            # timestamp column to its midnight instant, exactly what
            # datetime.fromisoformat does with a date-only string.
            if tag == "t":
                return True
            if tag in ("s", "d"):
                try:
                    _dt.datetime.fromisoformat(lit[1])
                    return True
                except ValueError:
                    return False
            return False
        if t == "boolean":
            return tag == "b"
        return False  # binary / array / map / struct: not comparable here

    def walk(node: list) -> None:
        kind = node[0]
        if kind in ("and", "or"):
            walk(node[1])
            walk(node[2])
        elif kind == "not":
            walk(node[1])
        elif kind in ("isnull", "notnull"):
            col_type(node[1])
        elif kind == "like":
            t = col_type(node[1])
            if not (
                t == "string" or t.startswith(("varchar", "char"))
            ):
                raise UnsupportedPredicateError(
                    f"LIKE needs a string column, got {t}"
                )
        elif kind == "cmpc":
            lt, rt = col_type(node[2]), col_type(node[3])
            cat = _cmp_cat
            if cat(lt) != cat(rt) or cat(lt).startswith("other"):
                raise UnsupportedPredicateError(
                    f"column comparison across {lt} vs {rt} is outside "
                    "this subset"
                )
        elif kind == "cmp":
            t = col_type(node[2])
            if not lit_ok(t, node[3]):
                raise UnsupportedPredicateError(
                    f"literal {node[3]!r} not comparable with "
                    f"{node[2]}: {t}"
                )
        elif kind == "eqns":
            t = col_type(node[1])
            if not lit_ok(t, node[2]):
                raise UnsupportedPredicateError(
                    f"literal {node[2]!r} not comparable with "
                    f"{node[1]}: {t}"
                )
        elif kind == "eqnsc":
            lt, rt = col_type(node[1]), col_type(node[2])
            if _cmp_cat(lt) != _cmp_cat(rt) or _cmp_cat(lt).startswith(
                "other"
            ):
                raise UnsupportedPredicateError(
                    f"column comparison across {lt} vs {rt} is outside "
                    "this subset"
                )
        elif kind == "in":
            t = col_type(node[1])
            for lit in node[2]:
                if not lit_ok(t, lit):
                    raise UnsupportedPredicateError(
                        f"literal {lit!r} not comparable with "
                        f"{node[1]}: {t}"
                    )
        else:  # pragma: no cover - parser can't emit others
            raise UnsupportedPredicateError(f"unknown node {kind!r}")

    walk(ast)


def compile_predicate(sql: str, types: dict[str, str]) -> list:
    """parse + validate in one step (driver-side entry point)."""
    ast = parse_predicate(sql)
    check_supported(ast, types)
    return ast


def columns_of(ast: list) -> set[str]:
    """Every column name a compiled AST references — the writer uses
    this to NULL-pad table columns absent from a merge_schema append so
    CHECK constraints evaluate under SQL NULL semantics instead of
    KeyError-ing executor-side."""
    cols: set[str] = set()

    def addcols(cx) -> None:
        if isinstance(cx, str):
            cols.add(cx.split(".", 1)[0])  # struct access -> base col
            return
        kind = cx[0]
        if kind == "fn" or kind == "substr":
            addcols(cx[1] if kind == "substr" else cx[2])
        elif kind == "arith":
            addcols(cx[2])
            if isinstance(cx[3], list) and cx[3][0] == "c":
                addcols(cx[3][1])
        elif kind in ("concat", "coalesce"):
            for a in cx[1]:
                if a[0] == "c":
                    addcols(a[1])
        elif kind == "case":
            for p, a in cx[1]:
                walk(p)
                if a[0] == "c":
                    addcols(a[1])
            if cx[2] is not None and cx[2][0] == "c":
                addcols(cx[2][1])

    def walk(node: list) -> None:
        kind = node[0]
        if kind in ("and", "or"):
            walk(node[1])
            walk(node[2])
        elif kind == "not":
            walk(node[1])
        elif kind in ("isnull", "notnull", "like", "in"):
            addcols(node[1])
        elif kind == "cmp":
            addcols(node[2])
        elif kind == "eqns":
            addcols(node[1])
        elif kind in ("cmpc", "eqnsc"):
            addcols(node[2] if kind == "cmpc" else node[1])
            addcols(node[3] if kind == "cmpc" else node[2])

    walk(ast)
    return cols


def _scalar_for(lit: list, arrow_type):
    """Convert a literal to a pyarrow scalar coerced to the COLUMN's
    type the way Spark coerces literals (string→date/timestamp parse,
    exact decimal from the literal's text, session-UTC for tz-aware
    timestamps)."""
    import pyarrow as pa

    tag, val = lit[0], lit[1]
    if pa.types.is_date(arrow_type):
        return pa.scalar(_dt.date.fromisoformat(val), type=arrow_type)
    if pa.types.is_timestamp(arrow_type):
        dtv = _dt.datetime.fromisoformat(val)
        if arrow_type.tz is not None and dtv.tzinfo is None:
            dtv = dtv.replace(tzinfo=_dt.timezone.utc)
        return pa.scalar(dtv, type=arrow_type)
    if pa.types.is_decimal(arrow_type):
        return pa.scalar(Decimal(val), type=arrow_type)
    if tag == "n":
        num = float(val) if ("." in val or "e" in val.lower()) else int(val)
        return pa.scalar(num)
    if tag == "b":
        return pa.scalar(bool(val), type=pa.bool_())
    return pa.scalar(val, type=pa.string() if pa.types.is_string(
        arrow_type
    ) else arrow_type)


def evaluate(ast: list, table) -> object:
    """Evaluate a compiled AST against a pyarrow Table whose column
    names are the predicate's (logical) names. Returns a boolean
    Array/ChunkedArray with SQL three-valued logic: comparisons
    propagate NULL, AND/OR are Kleene, NOT inverts through NULL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = table.num_rows

    def nulls_bool():
        return pa.nulls(n, pa.bool_())

    _CMP = {
        "=": pc.equal, "!=": pc.not_equal,
        "<": pc.less, "<=": pc.less_equal,
        ">": pc.greater, ">=": pc.greater_equal,
    }

    def colarr(cx):
        """Resolve a colx expression to an arrow array: plain column,
        dotted struct-field chain, or column-side arithmetic. Arithmetic
        runs in int64 (checked kernels) or float64, matching the values
        Spark produces whenever Spark itself doesn't raise on 32-bit
        ANSI overflow."""
        if isinstance(cx, str):
            if cx in table.column_names:
                return table.column(cx)
            head, *rest = cx.split(".")
            arr = table.column(head)
            for f in rest:
                if pa.types.is_null(arr.type):
                    return arr  # null struct column: stays all-null
                arr = pc.struct_field(arr, f)
            return arr
        kind = cx[0]
        if kind == "case":
            branches, els = cx[1], cx[2]
            arrs = [
                colarr(a[1]) if a[0] == "c" else a
                for _p, a in branches
            ]
            els_v = (
                (colarr(els[1]) if els[0] == "c" else els)
                if els is not None
                else None
            )
            candidates = arrs + ([els_v] if els_v is not None else [])
            # Result type: Spark-style numeric promotion (any floating
            # branch or fractional literal => float64, ints => int64);
            # non-numeric categories take the first real array's type.
            rtype = None
            numeric = False
            floaty = False
            for v in candidates:
                if isinstance(v, list):
                    if v[0] == "n":
                        numeric = True
                        floaty = floaty or (
                            "." in v[1] or "e" in v[1].lower()
                        )
                    continue
                if pa.types.is_null(v.type):
                    continue
                if pa.types.is_floating(v.type) or pa.types.is_integer(
                    v.type
                ):
                    numeric = True
                    floaty = floaty or pa.types.is_floating(v.type)
                elif rtype is None:
                    rtype = v.type
            if numeric:
                rtype = pa.float64() if floaty else pa.int64()
            if rtype is None:
                return pa.nulls(n)  # every branch null-typed

            def to_arr(v):
                if isinstance(v, list):
                    s = _scalar_for(v, rtype)
                    return s.cast(rtype) if s.type != rtype else s
                if pa.types.is_null(v.type):
                    return pa.nulls(n, rtype)
                return v.cast(rtype) if v.type != rtype else v

            acc = (
                to_arr(els_v) if els_v is not None
                else pa.nulls(n, rtype)
            )
            for (pred, _a), v in reversed(list(zip(branches, arrs))):
                # Spark CASE fires on TRUE only; NULL falls through.
                cond = pc.coalesce(ev(pred), pa.scalar(False))
                acc = pc.if_else(cond, to_arr(v), acc)
            return acc
        if kind == "concat":
            # Spark concat(): NULL if ANY argument is NULL — exactly
            # binary_join_element_wise's emit_null (last arg = sep).
            parts = []
            for a in cx[1]:
                if a[0] == "c":
                    arr = colarr(a[1])
                    if pa.types.is_null(arr.type):
                        return pa.nulls(n, pa.string())
                    parts.append(arr)
                else:
                    parts.append(pa.scalar(a[1], pa.string()))
            return pc.binary_join_element_wise(
                *parts, "", null_handling="emit_null"
            )
        if kind == "coalesce":
            arrs = []
            first_type = None
            for a in cx[1]:
                if a[0] == "c":
                    arr = colarr(a[1])
                    if pa.types.is_null(arr.type):
                        continue  # contributes nothing but NULLs
                    if first_type is None:
                        first_type = arr.type
                    arrs.append(arr)
            if first_type is None:
                lit_arrs = [a for a in cx[1] if a[0] != "c"]
                if not lit_arrs:
                    return pa.nulls(n)
                # All col args null-typed: result is the first literal.
                tag, val = lit_arrs[0][0], lit_arrs[0][1]
                if tag == "n":
                    py: object = (
                        float(val)
                        if ("." in val or "e" in val.lower())
                        else int(val)
                    )
                elif tag == "d":
                    py = _dt.date.fromisoformat(val)
                elif tag == "t":
                    py = _dt.datetime.fromisoformat(val)
                else:
                    py = val
                return pa.array([py] * n)
            out = []
            for a in cx[1]:
                if a[0] == "c":
                    arr = colarr(a[1])
                    if not pa.types.is_null(arr.type):
                        out.append(arr)
                else:
                    out.append(_scalar_for(a, first_type))
            return pc.coalesce(*out)
        if kind == "substr":
            base = colarr(cx[1])
            if pa.types.is_null(base.type):
                return base
            start = cx[2] - 1  # SQL 1-based -> 0-based
            stop = None if cx[3] is None else start + cx[3]
            return pc.utf8_slice_codeunits(base, start, stop=stop)
        base = colarr(cx[2])
        if pa.types.is_null(base.type):
            return base
        if kind == "fn":
            name = cx[1]
            if name == "length":
                # Spark length() counts codepoints; cast to int32 to
                # mirror its INT result type.
                return pc.cast(pc.utf8_length(base), pa.int32())
            if name == "lower":
                return pc.utf8_lower(base)
            if name == "upper":
                return pc.utf8_upper(base)
            if name == "trim":
                # Spark trim() strips SPACES only (not all whitespace).
                return pc.utf8_trim(base, " ")
            if name == "abs":
                if pa.types.is_floating(base.type):
                    return pc.abs(pc.cast(base, pa.float64()))
                return pc.abs_checked(pc.cast(base, pa.int64()))
            raise UnsupportedPredicateError(f"unknown function {name!r}")
        aop, rhs = cx[1], cx[3]
        if rhs[0] == "c":
            # Column-vs-column arithmetic ("/" refused at check time).
            rarr = colarr(rhs[1])
            if pa.types.is_null(rarr.type):
                return rarr
            if pa.types.is_floating(base.type) or pa.types.is_floating(
                rarr.type
            ):
                base = pc.cast(base, pa.float64())
                rarr = pc.cast(rarr, pa.float64())
            else:
                base = pc.cast(base, pa.int64())
                rarr = pc.cast(rarr, pa.int64())
            fn = {
                "+": pc.add_checked,
                "-": pc.subtract_checked,
                "*": pc.multiply_checked,
            }[aop]
            return fn(base, rarr)
        ltext = rhs[1]
        if aop == "/":
            # Spark's / is always double division.
            return pc.divide(
                pc.cast(base, pa.float64()), pa.scalar(float(ltext))
            )
        frac = "." in ltext or "e" in ltext.lower()
        if frac or pa.types.is_floating(base.type):
            base = pc.cast(base, pa.float64())
            s = pa.scalar(float(ltext), pa.float64())
        else:
            base = pc.cast(base, pa.int64())
            s = pa.scalar(int(ltext), pa.int64())
        fn = {
            "+": pc.add_checked,
            "-": pc.subtract_checked,
            "*": pc.multiply_checked,
        }[aop]
        return fn(base, s)

    def ev(node: list):
        kind = node[0]
        if kind == "and":
            return pc.and_kleene(ev(node[1]), ev(node[2]))
        if kind == "or":
            return pc.or_kleene(ev(node[1]), ev(node[2]))
        if kind == "not":
            return pc.invert(ev(node[1]))
        if kind == "isnull":
            return pc.is_null(colarr(node[1]))
        if kind == "notnull":
            return pc.is_valid(colarr(node[1]))
        if kind == "like":
            col = colarr(node[1])
            if pa.types.is_null(col.type):
                return nulls_bool()
            return pc.match_like(col, node[2])
        if kind == "cmpc":
            lcol, rcol = colarr(node[2]), colarr(node[3])
            if pa.types.is_null(lcol.type) or pa.types.is_null(
                rcol.type
            ):
                return nulls_bool()
            return _CMP[node[1]](lcol, rcol)
        if kind == "cmp":
            col = colarr(node[2])
            if pa.types.is_null(col.type):
                return nulls_bool()
            return _CMP[node[1]](col, _scalar_for(node[3], col.type))
        if kind == "in":
            col = colarr(node[1])
            if pa.types.is_null(col.type):
                return nulls_bool()
            out = None
            for lit in node[2]:
                eq = pc.equal(col, _scalar_for(lit, col.type))
                out = eq if out is None else pc.or_kleene(out, eq)
            return out
        if kind == "eqns":
            # Null-safe equality vs a (non-NULL) literal: NULL rows
            # compare FALSE, never NULL — Spark's <=>.
            col = colarr(node[1])
            if pa.types.is_null(col.type):
                return pa.array([False] * n, pa.bool_())
            return pc.coalesce(
                pc.equal(col, _scalar_for(node[2], col.type)),
                pa.scalar(False),
            )
        if kind == "eqnsc":
            lcol, rcol = colarr(node[1]), colarr(node[2])
            lnull = pa.types.is_null(lcol.type)
            rnull = pa.types.is_null(rcol.type)
            if lnull and rnull:
                return pa.array([True] * n, pa.bool_())
            if lnull:
                return pc.is_null(rcol)
            if rnull:
                return pc.is_null(lcol)
            return pc.or_(
                pc.and_(pc.is_null(lcol), pc.is_null(rcol)),
                pc.coalesce(pc.equal(lcol, rcol), pa.scalar(False)),
            )
        raise UnsupportedPredicateError(f"unknown node {kind!r}")

    return ev(ast)


def keep_mask(asts: list[list], table) -> object | None:
    """AND-of-NOT(pred) keep mask for a row group under a set of
    deferred deletes; None when no predicates apply. Rows whose mask is
    NULL must be DROPPED by the caller (arrow's filter default),
    matching `df.filter(~F.expr(p))`."""
    import pyarrow.compute as pc

    mask = None
    for ast in asts:
        keep = pc.invert(evaluate(ast, table))
        mask = keep if mask is None else pc.and_kleene(mask, keep)
    return mask
