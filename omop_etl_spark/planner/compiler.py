"""Spark plan builder for one target table.

Compiles a :class:`~omop_etl_spark.rules.model.TableSpec` into lazy
DataFrames following the reference's three-phase pipeline (reference
schema.py:449-479, SURVEY §0) re-expressed Spark-first:

1. **Mapping phase** — per key source, scan→project natural keys→
   filter, null-padded ``unionByName`` across sources, deterministic
   surrogate ids (:mod:`.surrogate`). Materialized once as
   ``mapping.<t>`` (the reference materializes it too; every column
   rule and every other table's FK remap re-reads it).
2. **Skeleton** — ``mapping.<t>.id`` is the seed of the target frame;
   all other columns start NULL (reference schema.py:320-328).
3. **Column phase** — instead of N sequential ``UPDATE … FROM``
   statements (reference generation.py:159-189), ONE wide select: rules
   are grouped by join spec (FROM items + predicates) and each group
   contributes a per-id ``matches`` frame (id, matched, value per rule)
   from a single scan+join; the target column folds rules in file order
   with ``when(matched_n, value_n).otherwise(…)``, so the LAST matching
   rule wins — exactly the reference's sequential last-writer-wins
   (schema.py:474-478) without mutating anything.

Why SQL text for the match frames: rule expressions/constraints are
opaque PostgreSQL SQL (after :mod:`omop_etl_spark.dialect` shims they
are valid Spark SQL). Generating one declarative ``SELECT`` per rule
and letting Catalyst classify the conjunctive predicates into join
conditions vs pushed-down filters IS the Spark-first design: the
comma-join + WHERE form compiles to Broadcast/SortMerge equi-joins,
never a cartesian product (verified in tests/test_plans.py).

Semantics shims the reference gets implicitly from Postgres
(SURVEY §4.3/§4.5):

* ``UPDATE … FROM`` applies at most one update per target row even when
  the join multiplies matches → we ``groupBy(id).agg(min(value))``
  (deterministic tiebreak; Postgres picks an arbitrary match).
* FK remap (``references``) preserves prior values on unmatched rows →
  the match frame is inner-joined to ``mapping.<ref>`` but folded via
  the left-join + when(), so misses keep the previous rule's value.
* Constant rules hit ALL rows unconditionally, bypassing primary-key
  scoping (reference schema.py:110-125).

Scale notes (100 TB): every match frame and the seed are keyed by the
surrogate id, so the fold's left joins all shuffle on the same key and
AQE reuses exchanges / broadcasts small match frames; the mapping frame
is written once and scanned many times (columnar, key-only, small
relative to facts). Single-partition windows never touch row-scale data
(see :mod:`.surrogate`).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dialect import spark_type, translate
from ..rules.model import (
    ConstantRule,
    DisabledRule,
    ExpressionRule,
    InlineQuery,
    PrimaryKeySource,
    TableRef,
    TableSpec,
)
from .surrogate import with_surrogate_id

__all__ = ["TableCompiler", "MAPPING_SCHEMA", "TARGET_SCHEMA"]

MAPPING_SCHEMA = "mapping"
TARGET_SCHEMA = "omop"


@dataclass
class _RuleSlot:
    """One enabled rule bound to its fold position."""

    index: int
    rule: ExpressionRule | ConstantRule


class TableCompiler:
    """Builds the mapping frame and the final wide select for one spec."""

    def __init__(
        self,
        spark: SparkSession,
        spec: TableSpec,
        temp_views: set[str] | None = None,
    ):
        self.spark = spark
        self.spec = spec
        self.temp_views = temp_views if temp_views is not None else set()
        #: frames persisted while building (surrogate-id range frames);
        #: the engine unpersists them once the mapping is materialized
        self.persisted: list[DataFrame] = []

    # -- naming helpers -----------------------------------------------------

    @property
    def mapping_name(self) -> str:
        return f"{MAPPING_SCHEMA}.{self.spec.name}"

    def _relation_sql(self, rel: TableRef | InlineQuery) -> str:
        """FROM-clause item for a relation. Bare names resolve via temp
        views first, then the session's current database (``USE
        <default_schema>``) — the same precedence as the reference's
        TempTables env (schema.py:92-102)."""
        if isinstance(rel, InlineQuery):
            return f"({translate(rel.query)}) AS {rel.alias}"
        if rel.schema:
            return f"{rel.schema}.{rel.name}"
        return rel.name

    def _relation_ref(self, rel: TableRef | InlineQuery) -> str:
        """How predicates refer to the relation's columns."""
        if isinstance(rel, InlineQuery):
            return rel.alias
        if rel.schema:
            return f"{rel.schema}.{rel.name}"
        return rel.name

    # -- phase 1: mapping ---------------------------------------------------

    def source_select_sql(self, src: PrimaryKeySource) -> str:
        """``SELECT <keys aliased t_c> FROM <relation> WHERE <constraints>``
        (reference schema.py:139-157)."""
        ref = src.table_alias
        cols = ", ".join(
            f"CAST({ref}.{c} AS {spark_type(t)}) AS {ref}_{c}"
            for c, t in src.columns.items()
        )
        sql = f"SELECT {cols} FROM {self._relation_sql(src.relation)}"
        if src.constraints:
            preds = " AND ".join(f"({translate(c)})" for c in src.constraints)
            sql += f" WHERE {preds}"
        return sql

    def build_mapping(self) -> DataFrame:
        """Null-padded union of per-source key frames + surrogate ids.

        Ids are the global rank under (source index, natural keys) —
        1-based, matching Postgres ``serial`` numbering across the
        per-source INSERTs but deterministic (SURVEY §4.3).
        """
        pk = self.spec.primary_key
        frames: list[DataFrame] = []
        order_cols: list[str] = []
        for i, src in enumerate(pk.sources.values()):
            df = self.spark.sql(self.source_select_sql(src))
            frames.append(df.withColumn("__src", F.lit(i)))
            for c in src.columns:
                name = f"{src.table_alias}_{c}"
                if name not in order_cols:
                    order_cols.append(name)

        union = frames[0]
        for f in frames[1:]:
            union = union.unionByName(f, allowMissingColumns=True)

        mapped = with_surrogate_id(
            union, ["__src", *order_cols], id_col="id",
            persist_registry=self.persisted,
        )
        return mapped.select("id", *order_cols)

    def mapping_sql(self) -> str:
        """The mapping phase as ONE executable Spark-SQL statement body
        (the ``compile`` artifact twin of :meth:`build_mapping`).

        Null-padded ``UNION ALL`` of per-source key selects plus a
        global ``row_number() OVER (ORDER BY source index, natural
        keys)`` — identical id values to the engine's distributed
        surrogate path (:mod:`.surrogate`), expressed as the plain
        window form an auditor can read and any Spark can run. The
        single-partition window is acceptable for an audit artifact;
        the engine path stays the scale path.
        """
        pk = self.spec.primary_key
        # (column name, DDL type, owning source alias) in build_mapping order
        all_cols: list[tuple[str, str, str]] = []
        for src in pk.sources.values():
            for c, t in src.columns.items():
                name = f"{src.table_alias}_{c}"
                if not any(n == name for n, _, _ in all_cols):
                    all_cols.append((name, spark_type(t), src.table_alias))

        branches = []
        for i, src in enumerate(pk.sources.values()):
            ref = src.table_alias
            own = {f"{ref}_{c}": c for c in src.columns}
            exprs = [f"{i} AS __src"]
            for name, typ, _ in all_cols:
                if name in own:
                    exprs.append(f"CAST({ref}.{own[name]} AS {typ}) AS {name}")
                else:
                    exprs.append(f"CAST(NULL AS {typ}) AS {name}")
            branch = (
                f"  SELECT {', '.join(exprs)}"
                f" FROM {self._relation_sql(src.relation)}"
            )
            if src.constraints:
                preds = " AND ".join(f"({translate(c)})" for c in src.constraints)
                branch += f" WHERE {preds}"
            branches.append(branch)

        names = [n for n, _, _ in all_cols]
        order = ", ".join(["__src", *names])
        union = "\n  UNION ALL\n".join(branches)
        return (
            f"SELECT row_number() OVER (ORDER BY {order}) AS id, "
            f"{', '.join(names)}\nFROM (\n{union}\n) __u"
        )

    # -- phase 3: column rules ----------------------------------------------

    def pk_join_predicates(self, pk_source_name: str) -> list[str]:
        """Join glue between a rule's source table and the mapping frame:
        ``<src>.<c> = mapping.<t>.<src>_<c>`` per natural-key column
        (reference schema.py:277-310). The target-side predicate
        (``omop.<t>.<pk> = mapping.<t>.id``) is structural in our plan:
        the fold joins match frames back to the seed by id."""
        src = self.spec.primary_key.sources[pk_source_name]
        ref = self._relation_ref(src.relation)
        ta = src.table_alias
        return [
            f"{ref}.{c} = {self.mapping_name}.{ta}_{c}" for c in src.columns
        ]

    def match_parts(
        self, rule: ExpressionRule
    ) -> tuple[list[str], list[str], str]:
        """``(from_items, predicates, value_expr)`` of a rule's match
        query. Rules whose ``(from_items, predicates)`` coincide share
        one join — only the projected value differs — which lets
        :meth:`build_target` compile them into a single match frame.
        For ``references`` rules the remap equality involves the value
        expression, so it lives in the predicates and the projected
        value is the referenced mapping's surrogate id."""
        from_items = [self.mapping_name]
        for rel in rule.tables:
            item = self._relation_sql(rel)
            if item not in from_items:
                from_items.append(item)

        preds = [f"({p})" for p in self.pk_join_predicates(rule.primary_key)]
        preds.extend(f"({translate(c)})" for c in rule.constraints)

        value_expr = translate(rule.expression)
        if rule.references is not None:
            ref_table = f"{MAPPING_SCHEMA}.{rule.references.mapping_table}"
            ref_col = f"{ref_table}.{rule.references.mapping_column}"
            if ref_table not in from_items:
                from_items.append(ref_table)
            preds.append(f"({ref_col} is not null)")
            preds.append(f"({ref_col} = {value_expr})")
            value_expr = f"{ref_table}.id"

        return from_items, preds, value_expr

    def match_sql(self, rule: ExpressionRule) -> str:
        """The declarative match query for one expression rule."""
        from_items, preds, value_expr = self.match_parts(rule)
        return (
            f"SELECT {self.mapping_name}.id AS __id, ({value_expr}) AS __v "
            f"FROM {', '.join(from_items)} "
            f"WHERE {' AND '.join(preds)}"
        )

    def group_match_frame(
        self, members: list[tuple[_RuleSlot, str]],
        from_items: list[str], preds: list[str],
    ) -> DataFrame:
        """Shared match frame for rules with one join spec: one scan +
        join producing ``__id`` plus a ``__v<i>`` per rule, deduped to
        one row per target id (the UPDATE…FROM one-update-per-row shim;
        per-column ``min`` over the same match set equals the per-rule
        dedup of separate frames)."""
        sel = ", ".join(
            f"({value}) AS __v{slot.index}" for slot, value in members
        )
        raw = self.spark.sql(
            f"SELECT {self.mapping_name}.id AS __id, {sel} "
            f"FROM {', '.join(from_items)} "
            f"WHERE {' AND '.join(preds)}"
        )
        return raw.groupBy("__id").agg(
            *[
                F.min(f"__v{slot.index}").alias(f"__v{slot.index}")
                for slot, _ in members
            ]
        )

    def enabled_slots(self) -> list[_RuleSlot]:
        return [
            _RuleSlot(i, r)
            for i, r in enumerate(self.spec.columns)
            if not isinstance(r, DisabledRule)
        ]

    def _grouped_slots(self):
        """Expression rules grouped by join spec + the per-slot group
        id — the shared shape of :meth:`build_target` (DataFrame) and
        :meth:`target_sql` (compile artifact)."""
        slots = self.enabled_slots()
        groups: dict[tuple[tuple[str, ...], tuple[str, ...]],
                     tuple[list[str], list[str],
                           list[tuple[_RuleSlot, str]]]] = {}
        for slot in slots:
            if isinstance(slot.rule, ConstantRule):
                continue
            from_items, preds, value = self.match_parts(slot.rule)
            key = (tuple(from_items), tuple(preds))
            if key not in groups:
                groups[key] = (from_items, preds, [])
            groups[key][2].append((slot, value))
        return slots, groups

    @staticmethod
    def _constant_sql(rule: ConstantRule) -> str:
        v = rule.constant
        if isinstance(v, bool):
            lit = "true" if v else "false"
        elif isinstance(v, (int, float)):
            lit = repr(v)
        else:
            lit = "'" + str(v).replace("'", "''") + "'"
        if rule.data_type:
            return f"CAST({lit} AS {spark_type(rule.data_type)})"
        return lit

    def target_sql(self) -> str:
        """The column phase as ONE executable Spark-SQL statement body
        (the ``compile`` artifact twin of :meth:`build_target`): a CTE
        per distinct join spec (``min()``-deduped per target id — the
        UPDATE…FROM one-update-per-row shim), left-joined to the
        mapping seed, each column folded in file order with nested
        ``CASE`` so the LAST matching rule wins."""
        pk_name = self.spec.primary_key.name
        slots, groups = self._grouped_slots()
        ctes, joins = [], []
        match_tab: dict[int, str] = {}
        for gid, (from_items, preds, members) in enumerate(groups.values()):
            sel = ", ".join(
                f"min(({value})) AS __v{slot.index}" for slot, value in members
            )
            ctes.append(
                f"__m{gid} AS (\n  SELECT {self.mapping_name}.id AS __id, {sel}"
                f"\n  FROM {', '.join(from_items)}"
                f"\n  WHERE {' AND '.join(preds)}"
                f"\n  GROUP BY {self.mapping_name}.id\n)"
            )
            joins.append(
                f"LEFT JOIN __m{gid} ON {self.mapping_name}.id = __m{gid}.__id"
            )
            for slot, _ in members:
                match_tab[slot.index] = f"__m{gid}"

        out = [f"CAST({self.mapping_name}.id AS BIGINT) AS {pk_name}"]
        for col_name in self.spec.column_order:
            expr = "NULL"
            for slot in slots:
                if slot.rule.name != col_name:
                    continue
                if isinstance(slot.rule, ConstantRule):
                    expr = self._constant_sql(slot.rule)
                else:
                    mt = match_tab[slot.index]
                    expr = (
                        f"CASE WHEN {mt}.__id IS NOT NULL "
                        f"THEN {mt}.__v{slot.index} ELSE {expr} END"
                    )
            out.append(f"({expr}) AS {col_name}")

        body = (
            f"SELECT {', '.join(out)}\nFROM {self.mapping_name}\n"
            + "\n".join(joins)
        )
        if ctes:
            return "WITH " + ",\n".join(ctes) + "\n" + body
        return body

    def build_target(self) -> DataFrame:
        """Phase 2+3: seed ids, join every rule's match frame, fold each
        column's rules in file order (last writer wins)."""
        pk_name = self.spec.primary_key.name
        seed = self.spark.table(self.mapping_name).select(
            F.col("id").alias("__rowid")
        )

        # group expression rules by join spec: one scan+join+dedup per
        # distinct (FROM items, predicates), not per rule — a table
        # whose columns all copy from one source compiles to ONE join
        slots, groups = self._grouped_slots()
        match_col: dict[int, str] = {}

        cur = seed
        for gid, (from_items, preds, members) in enumerate(groups.values()):
            mcol = f"__mg{gid}"
            m = self.group_match_frame(members, from_items, preds)
            m = m.select(
                F.col("__id").alias(f"__gid{gid}"),
                F.lit(True).alias(mcol),
                *[f"__v{slot.index}" for slot, _ in members],
            )
            for slot, _ in members:
                match_col[slot.index] = mcol
            cur = cur.join(
                m, cur["__rowid"] == m[f"__gid{gid}"], "left"
            ).drop(f"__gid{gid}")

        out_cols = [F.col("__rowid").cast("bigint").alias(pk_name)]
        for col_name in self.spec.column_order:
            value = F.lit(None)
            for slot in slots:
                if slot.rule.name != col_name:
                    continue
                if isinstance(slot.rule, ConstantRule):
                    val = F.lit(slot.rule.constant)
                    if slot.rule.data_type:
                        val = val.cast(spark_type(slot.rule.data_type).lower())
                    # constants apply to every row unconditionally
                    value = val
                else:
                    # a matching rule writes its value even when NULL
                    # (UPDATE SET col = expr semantics); members share
                    # the group's predicates, so group-match ⇔ rule-match
                    value = F.when(
                        F.col(match_col[slot.index]),
                        F.col(f"__v{slot.index}"),
                    ).otherwise(value)
            out_cols.append(value.alias(col_name))

        return cur.select(*out_cols)
