"""HeroQL lexer + recursive-descent parser.

Grammar follows the reference drafts directly:
- declarations & tables ........ Kernel/Drafts/draft:26-72
- functions / cases ............ Kernel/Drafts/draft:74-89
- queries ...................... Kernel/Drafts/draft:91-100
- expression grammar ........... Kernel/Drafts/draft:102-118
- mutation statements .......... Kernel/Drafts/draft:128-144
- aggregation pipeline ......... Kernel/Drafts/draft:146-162, draft_students:36-53

The parser produces a flat AST (plain dataclasses below); all name
resolution / typing happens in compiler.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class HeroQLSyntaxError(Exception):
    pass


# ------------------------------------------------------------------ lexer

KEYWORDS = {
    "data", "class", "enum", "union", "struct", "index", "where", "func",
    "case", "query", "collection_query", "partition_by", "group_by",
    "order_by", "order_by_desc", "range_by", "set", "update", "remove",
    "uncache", "not", "exists", "ensure", "if", "then", "else", "and",
    "or", "in", "out", "namespace", "using", "database", "for", "let",
    "true", "false", "optimize", "vacuum", "keep", "cluster_by",
    "package", "public", "transaction", "new", "discard", "merge",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|\#[^\n]*)
  | (?P<float>\d+\.\d+(?!\.))
  | (?P<int>\d+)
  | (?P<istring>\$"(?:[^"\\]|\\.)*")
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*|`[^`]+`)
  | (?P<op>::|:-|<-|\.\.|==|!=|<=|>=|\*|[()\{\}\[\],;.:=<>+\-/|@])
    """,
    re.VERBOSE,
)


# keywords that may still serve as variable / alias names in
# expression positions (the draft itself uses `index` as a variable,
# draft:86-88, and `count` as an output alias, draft_students:45);
# only the words with expression-level meaning stay reserved there
HARD_EXPR_KEYWORDS = {"if", "then", "else", "true", "false", "not", "and", "or", "exists", "ensure"}
SOFT_KEYWORDS = KEYWORDS - HARD_EXPR_KEYWORDS


@dataclass
class Tok:
    kind: str  # 'id' | 'kw' | 'int' | 'float' | 'string' | op text
    text: str
    pos: int
    end: int = 0  # source offset one past the raw lexeme


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _decode_string(raw: str) -> str:
    """Decode a quoted string literal's escape sequences."""
    body = raw[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _decode_istring(raw: str, pos: int) -> "InterpString":
    """Decode `$"text $(x) $(x.name) ..."` (draft_type:257) into
    alternating literal/reference parts."""
    body = raw[2:-1]
    parts: list = []
    buf: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            buf.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        elif c == "$" and i + 1 < len(body) and body[i + 1] == "(":
            end = body.find(")", i)
            if end < 0:
                raise HeroQLSyntaxError(f"unterminated $( in interpolated string at {pos}")
            ref = body[i + 2:end].strip()
            if not ref:
                raise HeroQLSyntaxError(f"empty $() in interpolated string at {pos}")
            if buf:
                parts.append("".join(buf))
                buf = []
            if "." in ref:
                base, _, fld = ref.partition(".")
                parts.append(FieldAccess(Var(base), fld))
            else:
                parts.append(Var(ref))
            i = end + 1
        else:
            buf.append(c)
            i += 1
    if buf:
        parts.append("".join(buf))
    return InterpString(parts)


def tokenize(src: str) -> list[Tok]:
    toks: list[Tok] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise HeroQLSyntaxError(f"unexpected character {src[i]!r} at offset {i}")
        i = m.end()
        if m.lastgroup in ("ws", "comment"):
            continue
        text = m.group()
        kind = m.lastgroup
        if kind == "id":
            if text.startswith("`"):  # quoted identifier (draft_students:51)
                text = text[1:-1]
            elif text in KEYWORDS:
                kind = "kw"
        elif kind == "op":
            kind = text
        toks.append(Tok(kind, text, m.start(), m.end()))
    toks.append(Tok("eof", "", len(src), len(src)))
    return toks


# ------------------------------------------------------------------ AST

@dataclass
class Var:
    name: str


@dataclass
class Wildcard:
    pass


@dataclass
class StructPattern:
    """`Type{pattern1, pattern2, ...}` (draft:123) — matches a
    tagged-union / struct value by constructor, binding its fields."""
    ctor: str
    args: list


@dataclass
class Const:
    value: object  # int | float | str | bool


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class UnaryOp:
    op: str  # 'not' | '-'
    operand: object


@dataclass
class FieldAccess:
    base: object  # Var (enum ref or row var)
    name: str


@dataclass
class IfExpr:
    cond: object
    then: object
    other: object  # None → draft:110 "returns true" form


@dataclass
class Atom:
    name: str              # table / func name (may be 'A::B')
    args: list
    member_of: object = None  # Var → relation-member atom `p.Children(x)` (draft:139)
    at_version: int | None = None  # `T@3(...)` — time travel to snapshot version 3


@dataclass
class NotLit:
    atom: Atom


@dataclass
class ExistsLit:
    atom: Atom


@dataclass
class EnsureLit:
    expr: object


@dataclass
class CompareLit:
    expr: object  # a boolean expression used as a filter


@dataclass
class AssignLit:
    var: str
    expr: object
    arrow: bool = False  # bound with `<-` (output-direction binding)


@dataclass
class FieldDef:
    name: str
    type: str  # 'int' | 'float' | 'string' | 'bool' | 'char' | class/enum name


@dataclass
class RelationDef:
    """`spouse * spouse : Person, 1..1` (draft:36-38)."""
    name: str
    inverse: str
    target: str
    card: str  # '1..1' | 'n..n' | 'n..1'


@dataclass
class IndexDef:
    kinds: list[str]  # Ordered / Hash / Unique / Cache
    cols: list[str]


@dataclass
class OutQueryDecl:
    """`query Name(in: t, ...) [-> (out: t, ...)] :- body;` — a NAMED
    query function (Kernel/README.md "Output only argument" and the
    QUERY/UPDATE `@`-command sections). Three body shapes, classified
    by the compiler:
    - scalar: only `<-` bindings / guards / calls — inlined at
      `x <- F(args)` call sites as pure Catalyst expressions;
    - relational: atoms + `@partition` / `@order_by(_desc)` /
      `@aggregate` commands — registers a derived relation named
      `name` with fields ins+outs (README Top10 / Top3ScorePerStudent /
      AverageTop3ScorePerStudent);
    - procedure: `@insert` / `@update` / `@remove` commands — a
      parameterized mutation invoked as a top-level `Name(args);`
      statement (README AddExam / UpdateExam / RemoveExam)."""
    name: str
    ins: list   # [(name, type|None)]
    outs: list  # [(name, type|None)]
    body: list
    # `transaction query Name(...) :- @insert ..., @update ...;`
    # (Kernel/README.md TRANSACTION): invoking the procedure runs its
    # whole mutation body atomically
    transactional: bool = False


@dataclass
class AtMarked:
    """`@score` inside an `@update` command atom (Kernel/README.md
    UPDATE): marks the column the command SETS; unmarked arguments are
    match keys."""
    name: str


@dataclass
class MutCmdLit:
    """`@insert T(args)` / `@update T(k, @v)` / `@remove T(k, _)` —
    a mutation command inside a query body (Kernel/README.md
    INSERT/UPDATE/REMOVE sections)."""
    kind: str  # 'insert' | 'update' | 'remove'
    atom: Atom


@dataclass
class PartitionCmd:
    """`@partition(student)` (Kernel/README.md "partition"): scopes
    the following `@order_by(_desc)` / `@aggregate` commands to
    per-key partitions."""
    keys: list  # exprs (typically Vars)


@dataclass
class AggregateCmd:
    """`@aggregate(average(score), ...)` (Kernel/README.md
    "aggregation"): collapses the frame to the partition keys,
    REBINDING each argument variable to its aggregate value (the
    README's `average <- score` then reads the aggregated score)."""
    items: list  # [(func_name, arg_expr)]


@dataclass
class OrderCmd:
    """`order <- @order_by_desc(score)` (Kernel/README.md "order_by,
    order_by_desc"): binds `var` to the row's 0-based rank within the
    current partition scope (`order < 10` then keeps the top 10)."""
    var: str
    expr: object
    desc: bool


@dataclass
class CallStmt:
    """Top-level `AddExam("alice", 90);` — invocation of a declared
    procedure query (mutation-command body) with constant arguments."""
    atom: Atom


@dataclass
class CallLit:
    """`x2 <- Square(x)` / `(x1, x2) <- Solve(a, b, c)` — invocation
    of an output-argument query inside a rule body. `outs` are the
    caller's variables bound (left side), `args` the input
    expressions."""
    outs: list  # [str]
    name: str
    args: list  # [expr]


@dataclass
class QueryIndexDecl:
    """Standalone `index Name { Hash(col) ... }` — the cached-query
    index declaration (Kernel/README.md "Cached Query")."""
    name: str
    indexes: list  # list[IndexDef]


@dataclass
class DataDecl:
    name: str
    fields: list[FieldDef]
    relations: list[RelationDef]
    is_class: bool
    indexes: list[IndexDef]
    where: object  # expr | None


@dataclass
class EnumDecl:
    name: str
    members: list[str]


@dataclass
class Rule:
    head: Atom
    body: list  # literals; [] → ground fact


@dataclass
class FuncDecl:
    name: str
    params: list[tuple]  # (mode, name); mode in ('', 'in', 'out')
    body: list  # [] if pure declaration


@dataclass
class QueryDecl:
    args: list  # patterns (Var/Wildcard/expr)
    body: list
    name: str = ""  # set by `let name = query ...`


@dataclass
class AggItem:
    alias: str
    func: str   # '' (passthrough) | Count/Average/Sum/Min/Max/Collect/OrderBy/OrderByDesc
    arg: object  # expr for passthrough/agg; None for Count()
    k: int = 0  # OrderBy(Desc) top-k


@dataclass
class WhereStage:
    expr: object


@dataclass
class PartitionByStage:
    keys: list  # exprs
    items: list  # AggItem


@dataclass
class GroupByStage:
    keys: list
    items: list
    having: object  # expr | None


@dataclass
class OrderByStage:
    expr: object
    desc: bool


@dataclass
class RangeByStage:
    first: int
    last: int


@dataclass
class CollectionQuery:
    args: list
    body: list
    stages: list
    name: str = ""


@dataclass
class SetStmt:
    atom: Atom


@dataclass
class UpdateStmt:
    name: str
    patterns: list
    body: list


@dataclass
class RemoveStmt:
    name: str
    patterns: list  # None → `remove T;`
    body: list


@dataclass
class UncacheStmt:
    name: str
    patterns: list
    body: list


@dataclass
class InterpString:
    """`$"text $(x.name) more"` (draft_type:257) — string
    interpolation; parts alternate literal str and Var/FieldAccess."""
    parts: list


@dataclass
class LetCtorAction:
    """`let x = Type{ field = expr, ... }` (draft_type:193,226):
    object construction with a fresh AutoIncresed instance id per
    driving row."""
    var: str
    ctor: str
    fields: list  # [(name, expr)]


@dataclass
class EnsureSetAction:
    """`ensure set T(args)` (draft_type:194-195,219): insert-if-absent
    on the table's Unique key — present rows are fine, never an
    error."""
    atom: Atom


@dataclass
class IfNotSetAction:
    """`if not set T(args) then <action>` (draft_type:203-205,320):
    first-wins conditional install; rows losing the Unique-key race
    run the `then` actions instead (typically `set Errors($"...")`)."""
    atom: Atom
    then: list


@dataclass
class ForMemberAction:
    """`for x.member(y) ( actions )` (draft_type:198-201): expand the
    driving set along a relation member, binding `y`, and run the
    nested actions set-at-a-time over the expanded rows."""
    base: str
    member: str
    var: str
    actions: list


@dataclass
class ForQueryStmt:
    args: list
    body: list
    actions: list  # SetStmt / RemoveStmt (atoms may reference query vars)


@dataclass
class DatabaseDecl:
    name: str


@dataclass
class PackageDecl:
    """`package NAME [using P1, P2];` (Kernel/README.md DATA PACKAGE
    DECLARATION): enter package NAME — subsequent declarations
    register under `NAME::` and are RECORDED pristine for
    instantiation (`x <- new NAME.`); `using` imports the listed
    packages' PUBLIC symbols (draft:190 "If a database references
    another database, all public symbol is usable")."""
    name: str
    uses: list


@dataclass
class GlobalLet:
    """`Zero <- 0.` / `Students <- new StudentPackage.` (Kernel/
    README.md GLOBAL READONLY VALUE): a session-wide READONLY binding
    — a constant usable in any expression, or a package instance."""
    name: str
    expr: object  # constant expression | NewExpr


@dataclass
class NewExpr:
    """`new P [from Other]` (Kernel/README.md USING DATA PACKAGE):
    instantiate data package P — independent (fresh empty tables), or
    inheriting instance Other's current data copy-on-write."""
    package: str
    parent: str | None


@dataclass
class DiscardStmt:
    """`discard Students;` — discard a data package instance
    (Kernel/README.md USING DATA PACKAGE)."""
    name: str


@dataclass
class MergeInstStmt:
    """`merge Students;` — merge an inheriting instance back to its
    parent instance (Kernel/README.md USING DATA PACKAGE); conflicts
    (both sides mutated one table since the fork) cancel."""
    name: str


@dataclass
class NamespaceDecl:
    """`namespace Nodes { ... }` (draft:170-175); nesting allowed."""
    name: str
    items: list


@dataclass
class UsingDecl:
    """`using namespace Nodes;` (draft:177)."""
    name: str


@dataclass
class StructDecl:
    """`struct Head(head : int, next : List);` (draft:6-10, 21-22)."""
    name: str
    fields: list  # FieldDef


@dataclass
class UnionDecl:
    """`union List = Head | End;` (draft:23)."""
    name: str
    members: list


@dataclass
class ClassDecl:
    """`class BinaryExpression : Expression ( fields );` (draft:14-19)
    — a TYPE declaration (no table); inheritance recorded for the
    subtype-closure surface (operators/adt.py class_hierarchy)."""
    name: str
    base: str | None
    fields: list  # FieldDef


@dataclass
class MigrateStmt:
    """`update schema T (new_col = expr, ...) [key (k, ...)]
    [partition_by (p)];` — schema migration with a data-moving
    procedure (Kernel/README.md ADMINISTRATION "Upload a new data
    package definition with data moving procedures"): rename / retype
    / drop / backfill as ONE committed transform over the old columns,
    riding SnapshotTable.migrate."""
    name: str
    items: list  # [(new_col, expr over OLD columns)]
    key_cols: list | None = None
    partition: object = "__keep__"  # str | None | "__keep__"


@dataclass
class MaintainStmt:
    """Storage-maintenance statements over durable tables:
    `optimize T;` (compaction), `optimize T cluster_by (a, b);`
    (z-order clustering), `vacuum T keep 3;`, `vacuum database
    keep 3;` (name None)."""

    kind: str  # "optimize" | "cluster" | "vacuum"
    name: str | None
    cluster_by: list | None = None
    keep_last: int = 1


@dataclass
class Program:
    items: list = field(default_factory=list)


# ------------------------------------------------------------------ parser

class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, text: str | None = None) -> bool:
        t = self.peek()
        return t.kind == kind and (text is None or t.text == text)

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "kw" and t.text in words

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.peek()
        if not self.at(kind, text):
            raise HeroQLSyntaxError(
                f"expected {text or kind!r}, got {t.text!r} at offset {t.pos}"
            )
        return self.next()

    def expect_kw(self, word: str) -> Tok:
        t = self.peek()
        if not self.at_kw(word):
            raise HeroQLSyntaxError(f"expected {word!r}, got {t.text!r} at offset {t.pos}")
        return self.next()

    def end_stmt(self) -> None:
        """Statement terminator: `;` (the draft dialect) or a DETACHED
        `.` (Kernel/README.md's Prolog-style terminator — `data
        Exams(student: string, score: int).` and body-final `\\n.`).
        Field-access dots are written flush against their base
        (`student.class`), so a dot with whitespace before it is never
        consumed by parse_postfix (see _dot_adjacent) and reaches us
        here."""
        if self.at(";") or self.at("."):
            self.next()
            return
        t = self.peek()
        raise HeroQLSyntaxError(
            f"expected ';' or '.', got {t.text!r} at offset {t.pos}"
        )

    def _dot_adjacent(self) -> bool:
        """True when the `.` at the cursor touches the previous token —
        a field access; a detached dot is the README statement
        terminator."""
        return self.i > 0 and self.peek().pos == self.toks[self.i - 1].end

    # -- entry
    def parse_item_spanned(self):
        """parse_item + attach the statement's SOURCE TEXT (consumed-
        token span) as `.src`, so durable commits can persist the
        program that produced them (Rewrite.md:6 "save query to
        log"); consumers use getattr(item, "src", None)."""
        start = self.peek().pos
        item = self.parse_item()
        last = self.toks[self.i - 1]
        item.src = self.src[start: last.pos + len(last.text)].strip()
        return item

    def parse_program(self) -> Program:
        prog = Program()
        while not self.at("eof"):
            prog.items.append(self.parse_item_spanned())
        return prog

    def parse_item(self):
        if self.at_kw("optimize"):
            self.next()
            name = self.qualified_name()
            cols = None
            if self.at_kw("cluster_by"):
                self.next()
                self.expect("(")
                cols = [self.expect("id").text]
                while self.at(","):
                    self.next()
                    cols.append(self.expect("id").text)
                self.expect(")")
            self.expect(";")
            return MaintainStmt("cluster" if cols else "optimize", name, cluster_by=cols)
        if self.at_kw("vacuum"):
            self.next()
            if self.at_kw("database"):
                self.next()
                name = None
            else:
                name = self.qualified_name()
            keep = 1
            if self.at_kw("keep"):
                self.next()
                keep = int(self.expect("int").text)
            self.expect(";")
            return MaintainStmt("vacuum", name, keep_last=keep)
        if self.at_kw("database"):
            self.next()
            name = self.qualified_name()
            self.expect(";")
            return DatabaseDecl(name)
        if self.at_kw("package"):
            self.next()
            name = self.qualified_name()
            uses: list[str] = []
            if self.at_kw("using"):
                self.next()
                uses.append(self.qualified_name())
                while self.at(","):
                    self.next()
                    uses.append(self.qualified_name())
            self.end_stmt()
            return PackageDecl(name, uses)
        if self.at_kw("public"):
            self.next()
            item = self.parse_item()
            item.public = True  # plain dataclasses: attribute injection
            return item
        if self.at_kw("transaction"):
            self.next()
            if not self.at_kw("query"):
                t = self.peek()
                raise HeroQLSyntaxError(
                    f"expected 'query' after 'transaction' at offset {t.pos}"
                )
            q = self.parse_query_decl()
            q.transactional = True
            return q
        if self.at_kw("discard"):
            self.next()
            name = self.qualified_name()
            self.end_stmt()
            return DiscardStmt(name)
        if self.at_kw("merge"):
            self.next()
            name = self.qualified_name()
            self.end_stmt()
            return MergeInstStmt(name)
        if self.at_kw("namespace"):
            self.next()
            name = self.qualified_name()
            self.expect("{")
            items = []
            while not self.at("}"):
                items.append(self.parse_item_spanned())
            self.expect("}")
            return NamespaceDecl(name, items)
        if self.at_kw("using"):
            self.next()
            self.expect_kw("namespace")
            name = self.qualified_name()
            self.expect(";")
            return UsingDecl(name)
        if self.at_kw("struct"):
            self.next()
            name = self.qualified_name()
            fields = self.parse_typed_fields()
            self.expect(";")
            return StructDecl(name, fields)
        if self.at_kw("union"):
            self.next()
            name = self.qualified_name()
            self.expect("=")
            members = [self.qualified_name()]
            while self.at("|"):
                self.next()
                members.append(self.qualified_name())
            self.expect(";")
            return UnionDecl(name, members)
        if self.at_kw("class"):
            self.next()
            name = self.qualified_name()
            base = None
            if self.at(":"):
                self.next()
                base = self.qualified_name()
            fields: list[FieldDef] = []
            if self.at("("):
                fields = self.parse_typed_fields()
            elif self.at("{"):  # draft:172-174 block form (member decls)
                self.next()
                while not self.at("}"):
                    fname = self.expect("id").text
                    self.expect(":")
                    ftype = self.qualified_name()
                    fields.append(FieldDef(fname, ftype))
                    if self.at(";") or self.at(","):
                        self.next()
                self.expect("}")
                if self.at(";"):
                    self.next()
                return ClassDecl(name, base, fields)
            if self.at(";"):
                self.next()
            return ClassDecl(name, base, fields)
        if self.at_kw("data"):
            return self.parse_data_decl()
        if self.at_kw("index"):
            # standalone CACHED-QUERY index (Kernel/README.md "Cached
            # Query": `index GrandParents { Hash(grandParent) }`) —
            # declares the cache keys of a rule-defined relation
            self.next()
            name = self.qualified_name()
            self.expect("{")
            entries: list[IndexDef] = []
            while not self.at("}"):
                kind = self.expect("id").text
                self.expect("(")
                cols: list[str] = []
                while not self.at(")"):
                    cols.append(self.dotted_name())
                    if self.at(","):
                        self.next()
                self.expect(")")
                if kind == "partition" and self.at("{"):
                    # nested partition-index block (Kernel/README.md
                    # DATA-COLLECTION: `partition(e) { Ordered(score),
                    # Unique(t) }`): each inner declaration scopes to
                    # one partition-key group — which FLATTENS exactly
                    # to the partition keys prepended to the inner
                    # columns (per-partition Unique(t) ≡ global
                    # Unique(e, t); per-partition Ordered(score) ≡ the
                    # (e, score) clustering hint), so the existing
                    # violation/ensure/storage machinery applies as-is
                    self.next()
                    while not self.at("}"):
                        ik = self.expect("id").text
                        self.expect("(")
                        icols: list[str] = []
                        while not self.at(")"):
                            icols.append(self.dotted_name())
                            if self.at(","):
                                self.next()
                        self.expect(")")
                        if self.at(";") or self.at(","):
                            self.next()
                        entries.append(IndexDef([ik], cols + icols))
                    self.expect("}")
                    if self.at(";") or self.at(","):
                        self.next()
                    continue
                if self.at(";") or self.at(","):
                    self.next()
                entries.append(IndexDef([kind], cols))
            self.expect("}")
            if self.at(";") or self.at("."):
                self.next()
            return QueryIndexDecl(name, entries)
        if self.at_kw("enum"):
            return self.parse_enum_decl()
        if self.at_kw("func"):
            return self.parse_func_decl()
        if self.at_kw("case"):
            self.next()
            atom = self.parse_atom()
            body = self.parse_rule_body_opt()
            self.end_stmt()
            return Rule(atom, body)
        if self.at_kw("query"):
            return self.parse_query_decl()
        if self.at_kw("collection_query"):
            return self.parse_collection_query()
        if self.at_kw("let"):
            self.next()
            name = self.expect("id").text
            self.expect("=")
            if self.at_kw("collection_query"):
                q = self.parse_collection_query()
            else:
                q = self.parse_query_decl()
            q.name = name
            return q
        if self.at_kw("set"):
            self.next()
            atom = self.parse_atom()
            self.expect(";")
            return SetStmt(atom)
        if self.at_kw("update"):
            self.next()
            if self.at("id", "schema"):
                return self.parse_migrate_stmt()
            name = self.qualified_name()
            pats = self.parse_pattern_list()
            self.expect(":-")
            body = self.parse_body()
            self.expect(";")
            return UpdateStmt(name, pats, body)
        if self.at_kw("remove") or self.at_kw("uncache"):
            cls = RemoveStmt if self.peek().text == "remove" else UncacheStmt
            self.next()
            name = self.qualified_name()
            pats = None
            body = []
            if self.at("("):
                pats = self.parse_pattern_list()
                body = self.parse_rule_body_opt()
            self.expect(";")
            return cls(name, pats, body)
        if self.at_kw("for"):
            return self.parse_for_query()
        t = self.peek()
        # a bare rule:  Head(args) :- body ;     (draft:58-62)
        # or a procedure CALL:  AddExam("alice", 90);   (README UPDATE —
        # invoking a declared @-command mutation query)
        if t.kind == "id":
            # `Zero <- 0.` / `Students <- new StudentPackage.` —
            # GLOBAL READONLY VALUE (Kernel/README.md)
            if self.peek(1).kind == "<-":
                name = self.next().text
                self.next()  # <-
                if self.at_kw("new"):
                    self.next()
                    pkg = self.qualified_name()
                    parent = None
                    if self.at("id", "from"):
                        self.next()
                        parent = self.qualified_name()
                    self.end_stmt()
                    return GlobalLet(name, NewExpr(pkg, parent))
                e = self.parse_expr()
                self.end_stmt()
                return GlobalLet(name, e)
            atom = self.parse_atom()
            if self.at(";") or self.at("."):
                self.next()
                return CallStmt(atom)
            self.expect(":-")
            body = self.parse_body()
            self.end_stmt()
            return Rule(atom, body)
        raise HeroQLSyntaxError(f"unexpected token {t.text!r} at offset {t.pos}")

    # -- declarations
    def parse_typed_fields(self) -> list[FieldDef]:
        """`( name : type, ... )` — struct/class field lists
        (draft:6-10, 14-19). Trailing commas tolerated as in the
        draft."""
        self.expect("(")
        fields: list[FieldDef] = []
        while not self.at(")"):
            fields.append(self.parse_field_def())
            if self.at(","):
                self.next()
        self.expect(")")
        return fields

    def parse_field_def(self) -> FieldDef:
        t = self.peek()
        # field names may be soft keywords (`class`, draft_students:51)
        if t.kind == "id" or (t.kind == "kw" and t.text in SOFT_KEYWORDS):
            fname = self.next().text
        else:
            raise HeroQLSyntaxError(f"expected field name at offset {t.pos}, got {t.text!r}")
        self.expect(":")
        ftype = self.qualified_name()
        if self.at("["):  # array-of sugar, e.g. `classes : Class[]` (draft_students:6)
            self.next()
            self.expect("]")
        return FieldDef(fname, ftype)

    def parse_data_decl(self) -> DataDecl:
        self.expect_kw("data")
        is_class = False
        if self.at_kw("class"):
            is_class = True
            self.next()
        name = self.qualified_name()
        fields: list[FieldDef] = []
        relations: list[RelationDef] = []
        self.expect("(")
        while not self.at(")"):
            t = self.peek()
            if not (t.kind == "id" or (t.kind == "kw" and t.text in SOFT_KEYWORDS)):
                raise HeroQLSyntaxError(f"expected field name at offset {t.pos}, got {t.text!r}")
            if self.peek(1).kind == "*":  # relation member: spouse * spouse : Person, 1..1
                fname = self.next().text
                self.next()
                inverse = self.expect("id").text
                self.expect(":")
                target = self.qualified_name()
                card = "n..n"
                if self.at(","):
                    # could be cardinality or next field; cardinality looks
                    # like  1..1 / n..n / n..1
                    nxt, nxt2 = self.peek(1), self.peek(2)
                    if (nxt.kind in ("int", "id")) and nxt2.kind == "..":
                        self.next()  # ','
                        lo = self.next().text
                        self.expect("..")
                        hi = self.next().text
                        card = f"{lo}..{hi}"
                relations.append(RelationDef(fname, inverse, target, card))
            else:
                fields.append(self.parse_field_def())
            if self.at(","):
                self.next()
        self.expect(")")
        indexes = self.parse_index_clause_opt()
        where = None
        if self.at_kw("where"):
            self.next()
            where = self.parse_expr()
        self.end_stmt()
        return DataDecl(name, fields, relations, is_class, indexes, where)

    def parse_index_clause_opt(self) -> list[IndexDef]:
        out: list[IndexDef] = []
        if not self.at_kw("index"):
            return out
        self.next()
        kind_words = ("Ordered", "Hash", "Unique", "Cache", "AutoIncresed")
        while True:
            kinds: list[str] = []
            cols: list[str] = []
            while self.at("id") and self.peek().text in kind_words:
                kinds.append(self.next().text)
                had_cols = False
                if self.at("("):
                    self.next()
                    while not self.at(")"):
                        cols.append(self.dotted_name())
                        if self.at("("):  # nested hint, e.g. Hash(exam, Ordered(score))
                            depth = 0
                            while True:
                                t = self.next()
                                if t.kind == "(":
                                    depth += 1
                                elif t.kind == ")":
                                    depth -= 1
                                    if depth == 0:
                                        break
                        if self.at(","):
                            self.next()
                    self.expect(")")
                    had_cols = True
                # `Ordered, Unique, Cache(husband.name)` (draft:69): a
                # col-less kind followed by another kind word continues
                # the SAME index def; a kind with cols ends it
                if (
                    not had_cols
                    and self.at(",")
                    and self.peek(1).kind == "id"
                    and self.peek(1).text in kind_words
                ):
                    self.next()
                    continue
                break
            if not kinds:
                break
            out.append(IndexDef(kinds, cols))
            if self.at(","):
                self.next()
                continue
            break
        return out

    def parse_enum_decl(self) -> EnumDecl:
        self.expect_kw("enum")
        name = self.expect("id").text
        self.expect("=")
        members = [self.expect("id").text]
        while self.at("|"):
            self.next()
            members.append(self.expect("id").text)
        self.expect(";")
        return EnumDecl(name, members)

    def parse_func_decl(self) -> FuncDecl:
        self.expect_kw("func")
        name = self.qualified_name()
        self.expect("(")
        params: list[tuple] = []

        def nameish() -> bool:
            t = self.peek()
            return t.kind == "id" or (t.kind == "kw" and t.text in SOFT_KEYWORDS)

        while not self.at(")"):
            mode = ""
            if self.at_kw("in") or self.at_kw("out"):
                mode = self.next().text
            if not nameish():
                t = self.peek()
                raise HeroQLSyntaxError(f"expected parameter name at offset {t.pos}")
            first = self.next().text
            # `func Fib_(int a, in index, ...)` (draft:86): an optional
            # type name precedes the parameter name
            if nameish():
                first = self.next().text
            params.append((mode, first))
            if self.at(","):
                self.next()
        self.expect(")")
        body = self.parse_rule_body_opt()
        self.expect(";")
        return FuncDecl(name, params, body)

    def parse_query_decl(self):
        self.expect_kw("query")
        if self.peek().kind == "id" or (
            self.peek().kind == "kw" and self.peek().text in SOFT_KEYWORDS
        ):
            return self.parse_out_query_decl()
        self.expect("(")
        args = []
        while not self.at(")"):
            args.append(self.parse_pattern())
            if self.at(","):
                self.next()
        self.expect(")")
        self.expect(":-")
        body = self.parse_body()
        self.end_stmt()
        return QueryDecl(args, body)

    def parse_out_query_decl(self) -> "OutQueryDecl":
        """Output-argument query function (Kernel/README.md "Output
        only argument"):

            query Square(x: int) -> (x2: int)
            :- x2 <- x * x;

        `<-` defines the execution direction (forward only — the
        compiler rejects running backward from outs to ins); invoked
        in rule bodies as `x2 <- Square(x)` or
        `(x1, x2) <- Solve(a, b, c)`."""
        name = self.qualified_name()
        self.expect("(")
        ins: list[tuple[str, str | None]] = []
        while not self.at(")"):
            pname = self.next().text
            ptype = None
            if self.at(":"):
                self.next()
                ptype = self.qualified_name()
            ins.append((pname, ptype))
            if self.at(","):
                self.next()
        self.expect(")")
        outs: list[tuple[str, str | None]] = []
        if self.at("-"):
            # `-> (out: t, ...)` is OPTIONAL: procedure queries
            # (README AddExam/UpdateExam/RemoveExam) declare none
            self.next()
            self.expect(">")
            self.expect("(")
            while not self.at(")"):
                pname = self.next().text
                ptype = None
                if self.at(":"):
                    self.next()
                    ptype = self.qualified_name()
                outs.append((pname, ptype))
                if self.at(","):
                    self.next()
            self.expect(")")
        self.expect(":-")
        body = self.parse_body()
        self.end_stmt()
        return OutQueryDecl(name, ins, outs, body)

    def parse_collection_query(self) -> CollectionQuery:
        self.expect_kw("collection_query")
        self.expect("(")
        args = []
        while not self.at(")"):
            args.append(self.parse_pattern())
            if self.at(","):
                self.next()
        self.expect(")")
        self.expect(":-")
        body = self.parse_body()
        stages = []
        while True:
            if self.at_kw("where"):
                self.next()
                stages.append(WhereStage(self.parse_expr()))
            elif self.at_kw("partition_by"):
                self.next()
                keys, items = self.parse_stage_head()
                stages.append(PartitionByStage(keys, items))
            elif self.at_kw("group_by"):
                self.next()
                keys, items = self.parse_stage_head()
                having = None
                if self.at(":-"):
                    self.next()
                    having = self.parse_expr()
                stages.append(GroupByStage(keys, items, having))
            elif self.at_kw("order_by") or self.at_kw("order_by_desc"):
                desc = self.next().text == "order_by_desc"
                stages.append(OrderByStage(self.parse_expr(), desc))
            elif self.at_kw("range_by"):
                self.next()
                first = int(self.expect("int").text)
                self.expect("..")
                last = int(self.expect("int").text)
                stages.append(RangeByStage(first, last))
            else:
                break
        self.expect(";")
        return CollectionQuery(args, body, stages)

    def parse_stage_head(self):
        """`exam(student, exam, OrderByDesc(score, 3))` — keys before '(',
        items inside (draft_students:39,45,51)."""
        keys = [self.parse_expr()]
        while self.at(","):  # expression parsing stops at '(' for us
            self.next()
            keys.append(self.parse_expr())
        self.expect("(")
        items = []
        while not self.at(")"):
            items.append(self.parse_agg_item())
            if self.at(","):
                self.next()
        self.expect(")")
        return keys, items

    AGG_FUNCS = ("Count", "Average", "Sum", "Min", "Max", "Collect", "OrderBy", "OrderByDesc")

    def parse_agg_item(self) -> AggItem:
        alias = ""
        nameish = self.at("id") or (self.peek().kind == "kw" and self.peek().text in SOFT_KEYWORDS)
        if nameish and self.peek(1).kind == "=":
            alias = self.next().text
            self.next()
        if self.at("id") and self.peek().text in self.AGG_FUNCS and self.peek(1).kind == "(":
            fn = self.next().text
            self.expect("(")
            arg = None
            k = 0
            if not self.at(")"):
                arg = self.parse_expr()
                if self.at(","):
                    self.next()
                    k = int(self.expect("int").text)
            self.expect(")")
            if not alias:
                # bare Average(score) names its output after the argument
                # column (draft_students:51-52 orders by `score`)
                alias = arg.name if isinstance(arg, Var) else (
                    arg.name if isinstance(arg, FieldAccess) else fn.lower()
                )
            return AggItem(alias, fn, arg, k)
        expr = self.parse_expr()
        if not alias:
            if isinstance(expr, Var):
                alias = expr.name
            elif isinstance(expr, FieldAccess):
                alias = expr.name
            else:
                raise HeroQLSyntaxError("aggregation item needs an alias")
        return AggItem(alias, "", expr, 0)

    def parse_for_query(self) -> ForQueryStmt:
        self.expect_kw("for")
        self.expect_kw("query")
        self.expect("(")
        args = []
        while not self.at(")"):
            args.append(self.parse_pattern())
            if self.at(","):
                self.next()
        self.expect(")")
        self.expect(":-")
        body = self.parse_body()
        actions = self.parse_action_block()
        if self.at(";"):
            self.next()
        return ForQueryStmt(args, body, actions)

    def parse_migrate_stmt(self) -> MigrateStmt:
        """`update schema T (col = expr, ...) [key (k, ...)]
        [partition_by (p)];` — after the leading `update` keyword."""
        self.expect("id", "schema")
        name = self.qualified_name()
        self.expect("(")
        items: list = []
        while not self.at(")"):
            t = self.peek()
            if not (t.kind == "id" or (t.kind == "kw" and t.text in SOFT_KEYWORDS)):
                raise HeroQLSyntaxError(f"expected column name at offset {t.pos}")
            cname = self.next().text
            self.expect("=")
            items.append((cname, self.parse_expr()))
            if self.at(","):
                self.next()
        self.expect(")")
        key_cols = None
        partition: object = "__keep__"
        while True:
            if self.at("id", "key"):
                self.next()
                self.expect("(")
                key_cols = [self.next().text]
                while self.at(","):
                    self.next()
                    key_cols.append(self.next().text)
                self.expect(")")
            elif self.at_kw("partition_by"):
                self.next()
                self.expect("(")
                partition = None if self.at(")") else self.next().text
                self.expect(")")
            else:
                break
        self.end_stmt()
        return MigrateStmt(name, items, key_cols, partition)

    def parse_action_block(self) -> list:
        """`( action [,|;] action ... )` — the draft separates actions
        with commas (draft_type:193-207); `;` also accepted."""
        self.expect("(")
        actions = []
        while not self.at(")"):
            actions.append(self.parse_action())
            if self.at(";") or self.at(","):
                self.next()
        self.expect(")")
        return actions

    def parse_action(self):
        if self.at_kw("set"):
            self.next()
            return SetStmt(self.parse_atom())
        if self.at_kw("remove"):
            self.next()
            name = self.qualified_name()
            pats = self.parse_pattern_list() if self.at("(") else None
            return RemoveStmt(name, pats, [])
        if self.at_kw("ensure"):
            self.next()
            self.expect_kw("set")
            return EnsureSetAction(self.parse_atom())
        if self.at_kw("let"):
            self.next()
            var = self.expect("id").text
            self.expect("=")
            ctor = self.qualified_name()
            self.expect("{")
            fields = []
            while not self.at("}"):
                fname = self.expect("id").text
                self.expect("=")
                fields.append((fname, self.parse_expr()))
                if self.at(","):
                    self.next()
            self.expect("}")
            return LetCtorAction(var, ctor, fields)
        if self.at_kw("if"):
            self.next()
            self.expect_kw("not")
            self.expect_kw("set")
            atom = self.parse_atom()
            self.expect_kw("then")
            then = self.parse_action_block() if self.at("(") else [self.parse_action()]
            return IfNotSetAction(atom, then)
        if self.at_kw("for"):
            # nested member block: for x.member(y) ( actions )
            self.next()
            base = self.expect("id").text
            self.expect(".")
            member = self.expect("id").text
            self.expect("(")
            var = self.expect("id").text
            self.expect(")")
            actions = self.parse_action_block()
            return ForMemberAction(base, member, var, actions)
        t = self.peek()
        raise HeroQLSyntaxError(f"unsupported for-query action {t.text!r} at {t.pos}")

    # -- rule bodies
    def parse_rule_body_opt(self) -> list:
        if self.at(":-"):
            self.next()
            return self.parse_body()
        return []

    def parse_body(self) -> list:
        lits = [self.parse_literal()]
        while self.at(","):
            self.next()
            lits.append(self.parse_literal())
        return lits

    def parse_literal(self):
        # `@insert T(...)` / `@partition(k)` / `@aggregate(f(x))` —
        # the README's @-command dialect (see _parse_at_command)
        if self.at("@"):
            return self._parse_at_command()
        # `(x1, x2) <- Solve(a, b, c)` — tuple-destructuring call of an
        # output-argument query (Kernel/README.md "Output only argument")
        if self.at("("):
            j = self.i + 1
            outs: list[str] = []
            ok = False
            while self.toks[j].kind == "id":
                outs.append(self.toks[j].text)
                j += 1
                if self.toks[j].kind == ",":
                    j += 1
                    continue
                ok = self.toks[j].kind == ")" and self.toks[j + 1].kind == "<-"
                break
            if ok and outs:
                self.i = j + 2
                return self._parse_call_rhs(outs)
        if self.at_kw("not"):
            self.next()
            return NotLit(self.parse_atom())
        if self.at_kw("exists"):
            self.next()
            return ExistsLit(self.parse_atom())
        if self.at_kw("ensure"):
            self.next()
            return EnsureLit(self.parse_expr())
        # atom?  ID[::ID...] '('     or member atom  var.Rel '('
        if self.peek().kind == "id":
            save = self.i
            try:
                atom = self.try_parse_atom()
                if atom is not None:
                    return atom
            except HeroQLSyntaxError:
                pass
            self.i = save
        expr = self.parse_expr()
        if self.at("=") :
            if not isinstance(expr, Var):
                t = self.peek()
                raise HeroQLSyntaxError(f"assignment target must be a variable at {t.pos}")
            self.next()
            return AssignLit(expr.name, self.parse_expr())
        if self.at("<-"):
            # output-direction binding: `x2 <- Square(x)` (call) or
            # `delta <- b*b - 4*a*c` (compute)
            if not isinstance(expr, Var):
                t = self.peek()
                raise HeroQLSyntaxError(
                    f"only out arguments / locals may stand left of `<-` at {t.pos}"
                )
            self.next()
            if self.at("@"):
                # `order <- @order_by_desc(score)` (Kernel/README.md
                # "order_by, order_by_desc"): 0-based rank binding
                self.next()
                t = self.peek()
                if not self.at_kw("order_by") and not self.at_kw("order_by_desc"):
                    raise HeroQLSyntaxError(
                        f"only @order_by / @order_by_desc bind with `<-` "
                        f"(got {t.text!r} at offset {t.pos})"
                    )
                desc = self.next().text == "order_by_desc"
                self.expect("(")
                oexpr = self.parse_expr()
                self.expect(")")
                return OrderCmd(expr.name, oexpr, desc)
            j = self.i
            while self.toks[j].kind == "id" and self.toks[j + 1].kind == "::":
                j += 2
            if self.toks[j].kind == "id" and self.toks[j + 1].kind == "(":
                return self._parse_call_rhs([expr.name])
            return AssignLit(expr.name, self.parse_expr(), arrow=True)
        return CompareLit(expr)

    def _parse_at_command(self):
        """Parse a rule-body `@`-command (Kernel/README.md QUERY/UPDATE
        sections): `@insert|@update|@remove ATOM` (update atoms may
        `@`-mark the columns to set), `@partition(keys)`,
        `@aggregate(func(arg), ...)`. The `var <- @order_by[_desc](x)`
        form is handled by the `<-` branch of parse_literal."""
        self.expect("@")
        t = self.peek()
        word = t.text
        if word in ("insert", "update", "remove"):
            self.next()
            name = self.qualified_name()
            self.expect("(")
            args: list = []
            while not self.at(")"):
                if self.at("@"):
                    self.next()
                    args.append(AtMarked(self.next().text))
                else:
                    args.append(self.parse_pattern())
                if self.at(","):
                    self.next()
            self.expect(")")
            return MutCmdLit(word, Atom(name, args))
        if word == "partition":
            self.next()
            self.expect("(")
            keys = [self.parse_expr()]
            while self.at(","):
                self.next()
                keys.append(self.parse_expr())
            self.expect(")")
            return PartitionCmd(keys)
        if word == "aggregate":
            self.next()
            self.expect("(")
            items: list = []
            while not self.at(")"):
                fn = self.next().text
                self.expect("(")
                arg = self.parse_expr()
                self.expect(")")
                items.append((fn, arg))
                if self.at(","):
                    self.next()
            self.expect(")")
            return AggregateCmd(items)
        raise HeroQLSyntaxError(
            f"unknown @-command {word!r} at offset {t.pos} (expected insert/"
            "update/remove/partition/aggregate; order_by forms bind with `<-`)"
        )

    def _parse_call_rhs(self, outs: list[str]) -> CallLit:
        """After `outs <-`: parse `Name(expr, ...)` — the invocation of
        an output-argument query."""
        name = self.qualified_name()
        self.expect("(")
        args = []
        while not self.at(")"):
            args.append(self.parse_expr())
            if self.at(","):
                self.next()
        self.expect(")")
        return CallLit(outs, name, args)

    def try_parse_atom(self):
        """Parse `T(...)`, `A::B(...)` or `var.Member(...)`; None if the
        lookahead is not an atom."""
        if self.peek().kind != "id":
            return None
        # member atom: id '.' id '('
        if self.peek(1).kind == "." and self.peek(2).kind == "id" and self.peek(3).kind == "(":
            base = Var(self.next().text)
            self.next()
            member = self.next().text
            args = self.parse_pattern_list()
            return Atom(member, args, member_of=base)
        # plain/qualified atom, optionally time-traveled: `T@3(...)`
        # reads snapshot version 3 of a durable table
        j = self.i
        while self.toks[j].kind == "id" and self.toks[j + 1].kind == "::":
            j += 2
        if self.toks[j].kind == "id" and self.toks[j + 1].kind == "(":
            name = self.qualified_name()
            args = self.parse_pattern_list()
            return Atom(name, args)
        if (
            self.toks[j].kind == "id"
            and self.toks[j + 1].kind == "@"
            and self.toks[j + 2].kind == "int"
            and self.toks[j + 3].kind == "("
        ):
            name = self.qualified_name()
            self.next()  # '@'
            ver = int(self.next().text)
            args = self.parse_pattern_list()
            return Atom(name, args, at_version=ver)
        return None

    def parse_atom(self) -> Atom:
        atom = self.try_parse_atom()
        if atom is None:
            t = self.peek()
            raise HeroQLSyntaxError(f"expected atom at offset {t.pos}, got {t.text!r}")
        return atom

    def parse_pattern_list(self) -> list:
        self.expect("(")
        pats = []
        while not self.at(")"):
            pats.append(self.parse_pattern())
            if self.at(","):
                self.next()
        self.expect(")")
        return pats

    def parse_pattern(self):
        if self.at("id") and self.peek().text == "_" :
            self.next()
            return Wildcard()
        # constructor pattern: Type{p1, p2, ...} (draft:123)
        if self.at("id"):
            j = self.i
            while self.toks[j].kind == "id" and self.toks[j + 1].kind == "::":
                j += 2
            if self.toks[j].kind == "id" and self.toks[j + 1].kind == "{":
                ctor = self.qualified_name()
                self.expect("{")
                args = []
                while not self.at("}"):
                    args.append(self.parse_pattern())
                    if self.at(","):
                        self.next()
                self.expect("}")
                return StructPattern(ctor, args)
        return self.parse_expr()

    # -- expressions (draft:102-118 precedence)
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at_kw("or"):
            self.next()
            left = BinOp("or", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_kw("and"):
            self.next()
            left = BinOp("and", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at_kw("not"):
            self.next()
            return UnaryOp("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_additive()
        if self.peek().kind in ("==", "!=", "<", "<=", ">", ">="):
            op = self.next().kind
            return BinOp(op, left, self.parse_additive())
        return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.peek().kind in ("+", "-"):
            op = self.next().kind
            left = BinOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.peek().kind in ("*", "/"):
            op = self.next().kind
            left = BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("-"):
            self.next()
            return UnaryOp("-", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        # field names may collide with keywords (`student.class`,
        # draft_students:51) — accept either after the dot; the dot
        # must TOUCH its base AND its field (field access is written
        # flush on both sides), else it is a statement terminator:
        # `order < 10 \n .` detaches before the dot, and the README's
        # `Zero <- 0.` detaches after it (the next statement's leading
        # identifier must not read as a field of the literal)
        while (
            self.at(".")
            and self.peek(1).kind in ("id", "kw")
            and self._dot_adjacent()
            and self.peek(1).pos == self.peek().end
        ):
            self.next()
            e = FieldAccess(e, self.next().text)
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "int":
            self.next()
            return Const(int(t.text))
        if t.kind == "float":
            self.next()
            return Const(float(t.text))
        if t.kind == "string":
            self.next()
            return Const(_decode_string(t.text))
        if t.kind == "istring":
            self.next()
            return _decode_istring(t.text, t.pos)
        if self.at_kw("true"):
            self.next()
            return Const(True)
        if self.at_kw("false"):
            self.next()
            return Const(False)
        if self.at_kw("if"):
            self.next()
            cond = self.parse_expr()
            self.expect_kw("then")
            then = self.parse_expr()
            other = None
            if self.at_kw("else"):
                self.next()
                other = self.parse_expr()
            return IfExpr(cond, then, other)
        if t.kind == "(":
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.kind == "id":
            return Var(self.qualified_name())
        if t.kind == "kw" and t.text in SOFT_KEYWORDS:
            self.next()
            return Var(t.text)
        raise HeroQLSyntaxError(f"unexpected token {t.text!r} at offset {t.pos}")

    # -- names
    def qualified_name(self) -> str:
        parts = [self.expect("id").text]
        while self.at("::"):
            self.next()
            parts.append(self.expect("id").text)
        return "::".join(parts)

    def dotted_name(self) -> str:
        parts = [self.expect("id").text]
        while self.at("."):
            self.next()
            parts.append(self.expect("id").text)
        return ".".join(parts)


def parse(src: str) -> Program:
    return Parser(src).parse_program()
