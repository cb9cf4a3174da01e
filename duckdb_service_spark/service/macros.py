"""DuckDB CREATE MACRO support — bind-time inline expansion.

DuckDB macros (scalar `CREATE MACRO f(a, b := 1) AS a + b` and table
`CREATE MACRO t(x) AS TABLE SELECT ...`) are untyped SQL templates expanded
at bind time, not functions with a runtime calling convention. The faithful
Spark mapping is therefore the same move at the routing layer: store the
parameter list + body text, and textually inline every call site (balanced
parentheses, string-literal-safe, named `p := v` and default arguments
honored) before the statement reaches Spark SQL. No UDF is registered and
nothing runs per-row in Python — after expansion the plan is ordinary
Catalyst-optimized SQL, exactly as DuckDB's binder would produce.

Reference reach: macros arrive through the passthrough surface
(`db/db.go:52,70`); syntax per the public DuckDB docs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .dialect import UnsupportedDialect, _split_literals

_MAX_EXPANSION_ROUNDS = 16

_CREATE_RE = re.compile(
    r"^CREATE\s+(OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?MACRO\s+(\w+)\s*\(",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^DROP\s+MACRO\s+(IF\s+EXISTS\s+)?(\w+)\s*$", re.IGNORECASE
)
_IDENT_CALL_RE = re.compile(r"\b(\w+)\s*\(")


@dataclass
class MacroDef:
    name: str
    params: list[str]
    defaults: dict[str, str] = field(default_factory=dict)
    body: str = ""
    is_table: bool = False

    def to_json(self) -> dict:
        return {
            "name": self.name,
            "params": self.params,
            "defaults": self.defaults,
            "body": self.body,
            "is_table": self.is_table,
        }

    @classmethod
    def from_json(cls, d: dict) -> "MacroDef":
        return cls(
            name=d["name"],
            params=list(d["params"]),
            defaults=dict(d.get("defaults", {})),
            body=d["body"],
            is_table=bool(d.get("is_table", False)),
        )


def _matching_paren(text: str, open_idx: int) -> int:
    """Index of the ')' matching text[open_idx] == '(', literal-aware.
    Returns -1 if unbalanced."""
    depth = 0
    in_str = False
    i = open_idx
    while i < len(text):
        ch = text[i]
        if in_str:
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _split_top_commas(text: str) -> list[str]:
    """Split at paren-depth-0 commas outside string literals."""
    parts: list[str] = []
    depth = 0
    in_str = False
    cur = []
    for i, ch in enumerate(text):
        if in_str:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    pass  # next iteration appends the escaped quote
                else:
                    in_str = False
            continue
        if ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur or parts:
        parts.append("".join(cur))
    return [p.strip() for p in parts]


def parse_create_macro(sql: str) -> MacroDef | None:
    """Parse CREATE [OR REPLACE] [TEMP] MACRO name(params) AS [TABLE] body.
    Returns None if the statement is not CREATE MACRO."""
    m = _CREATE_RE.match(sql.strip())
    if m is None:
        return None
    name = m.group(2).lower()
    open_idx = sql.find("(", m.start(2))
    close_idx = _matching_paren(sql, open_idx)
    if close_idx < 0:
        raise UnsupportedDialect("CREATE MACRO: unbalanced parameter list")
    raw_params = sql[open_idx + 1 : close_idx].strip()
    rest = sql[close_idx + 1 :].strip()
    mas = re.match(r"^AS\s+(TABLE\s+)?(.+)$", rest, re.IGNORECASE | re.DOTALL)
    if mas is None:
        raise UnsupportedDialect("CREATE MACRO: expected AS <expression>")
    is_table = bool(mas.group(1))
    body = mas.group(2).strip().rstrip(";")

    params: list[str] = []
    defaults: dict[str, str] = {}
    if raw_params:
        for p in _split_top_commas(raw_params):
            dm = re.match(r"^(\w+)\s*:=\s*(.+)$", p, re.DOTALL)
            if dm:
                params.append(dm.group(1).lower())
                defaults[dm.group(1).lower()] = dm.group(2).strip()
            elif re.fullmatch(r"\w+", p):
                params.append(p.lower())
            else:
                raise UnsupportedDialect(f"CREATE MACRO: bad parameter {p!r}")
    return MacroDef(name=name, params=params, defaults=defaults, body=body, is_table=is_table)


def parse_drop_macro(sql: str) -> tuple[str, bool] | None:
    m = _DROP_RE.match(sql.strip())
    if m is None:
        return None
    return m.group(2).lower(), bool(m.group(1))


def _substitute_params(body: str, binding: dict[str, str]) -> str:
    """Replace parameter identifiers in the macro body with their
    (parenthesized) argument text — only in code chunks, never inside
    string literals."""
    if not binding:
        return body
    pat = re.compile(
        r"\b(" + "|".join(re.escape(p) for p in binding) + r")\b", re.IGNORECASE
    )

    def repl_chunk(chunk: str) -> str:
        return pat.sub(lambda m: "(" + binding[m.group(1).lower()] + ")", chunk)

    return "".join(
        chunk if is_lit else repl_chunk(chunk) for is_lit, chunk in _split_literals(body)
    )


def _bind_args(mac: MacroDef, args: list[str]) -> dict[str, str]:
    """Positional-then-named argument binding with defaults, DuckDB-style."""
    binding: dict[str, str] = dict(mac.defaults)
    pos_idx = 0
    seen_named = False
    for a in args:
        nm = re.match(r"^(\w+)\s*:=\s*(.+)$", a, re.DOTALL)
        if nm:
            seen_named = True
            pname = nm.group(1).lower()
            if pname not in mac.params:
                raise UnsupportedDialect(
                    f"macro {mac.name}: unknown named argument {pname!r}"
                )
            binding[pname] = nm.group(2).strip()
        else:
            if seen_named:
                raise UnsupportedDialect(
                    f"macro {mac.name}: positional argument after named argument"
                )
            if pos_idx >= len(mac.params):
                raise UnsupportedDialect(
                    f"macro {mac.name}: too many arguments ({len(args)} given, "
                    f"{len(mac.params)} declared)"
                )
            binding[mac.params[pos_idx]] = a
            pos_idx += 1
    missing = [p for p in mac.params if p not in binding]
    if missing:
        raise UnsupportedDialect(f"macro {mac.name}: missing argument(s) {missing}")
    return binding


def expand_macros(sql: str, macros: dict[str, MacroDef]) -> str:
    """Inline every macro call site in `sql`. Iterates so macros may call
    macros (cycle-capped). String literals are never touched; call-site
    argument lists are split at top-level commas only."""
    if not macros:
        return sql
    for _ in range(_MAX_EXPANSION_ROUNDS):
        expanded = _expand_once(sql, macros)
        if expanded == sql:
            return sql
        sql = expanded
    raise UnsupportedDialect("macro expansion did not terminate (recursive macro?)")


def bind_prepared(template: str, args: list[str]) -> str:
    """Bind EXECUTE arguments into a PREPAREd template: `$1`..`$n` by index
    and `?` left-to-right, code chunks only (a `$1` inside a string literal
    is data, not a parameter). Arguments are SQL literal expressions and are
    inlined parenthesized — the same bind-time move DuckDB's PREPARE makes,
    minus the plan cache (Spark re-plans per call; Catalyst planning is not
    the bottleneck at analytics latencies)."""
    n_positional = 0

    def repl_dollar(m: re.Match) -> str:
        i = int(m.group(1))
        if not (1 <= i <= len(args)):
            raise UnsupportedDialect(
                f"prepared statement: parameter ${i} out of range ({len(args)} given)"
            )
        return "(" + args[i - 1] + ")"

    out = []
    for is_lit, chunk in _split_literals(template):
        if is_lit:
            out.append(chunk)
            continue
        chunk = re.sub(r"\$(\d+)", repl_dollar, chunk)
        while "?" in chunk:
            if n_positional >= len(args):
                raise UnsupportedDialect(
                    f"prepared statement: more ? placeholders than arguments ({len(args)} given)"
                )
            chunk = chunk.replace("?", "(" + args[n_positional] + ")", 1)
            n_positional += 1
        out.append(chunk)
    return "".join(out)


def _expand_once(sql: str, macros: dict[str, MacroDef]) -> str:
    # Work on the raw string but validate each candidate site is in code
    # (not inside a string literal) by tracking quote state up to the site.
    out = []
    i = 0
    in_str = False
    n = len(sql)
    while i < n:
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    out.append(sql[i + 1])
                    i += 2
                    continue
                in_str = False
            i += 1
            continue
        if ch == "'":
            in_str = True
            out.append(ch)
            i += 1
            continue
        m = _IDENT_CALL_RE.match(sql, i)
        if m and m.group(1).lower() in macros and (i == 0 or not re.match(r"[\w.]", sql[i - 1])):
            mac = macros[m.group(1).lower()]
            open_idx = sql.index("(", m.end(1))
            close_idx = _matching_paren(sql, open_idx)
            if close_idx < 0:
                raise UnsupportedDialect(f"macro {mac.name}: unbalanced call")
            raw_args = sql[open_idx + 1 : close_idx].strip()
            args = _split_top_commas(raw_args) if raw_args else []
            binding = _bind_args(mac, args)
            out.append("(" + _substitute_params(mac.body, binding) + ")")
            i = close_idx + 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)
