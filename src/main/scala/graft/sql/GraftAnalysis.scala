package graft.sql

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftshim.GraftShims
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.iceberg.IcebergWriter

/** Analyzer extensions for catalog-resolved graft tables.
  *
  * This rule owns the ROW-LEVEL SQL conversions only: `DELETE FROM` /
  * `UPDATE` / `MERGE INTO` / dynamic `INSERT OVERWRITE` over catalog
  * identifiers convert to commands running the existing writer commits
  * ([[IcebergWriter.delete]]/[[IcebergWriter.update]]/
  * [[IcebergWriter.merge]]) — MoR tombstones, never file rewrites.
  *
  * The READ fast path lives in [[GraftKeyedModeRule]] (optimizer stage):
  * a [[GraftTable]] relation is REPLACED by the logical plan of the
  * engine's own scan (`IcebergScan.scan` — MoR composition,
  * manifest/file pruning, provenance handling), aliased to the
  * relation's attribute ids — the reference's bind_replace idea
  * (`iceberg_scan.cpp:305`) — OR kept as a keyed V2 scan when the plan
  * shape earns SPJ / runtime pruning, OR collapsed to a metadata
  * COUNT(*). Deciding at the optimizer makes the DataFrame API and SQL
  * equivalent: both surfaces' full plans are visible there.
  *
  * Write targets (INSERT/append/overwrite and the row-level statements'
  * own targets) keep their V2 relation so Spark's write resolution (or
  * this rule's command conversion) still sees the table.
  */
object GraftTableRewrite {
  /** Escape hatch (and the honest way to test the V1 bridge): `false`
    * leaves catalog relations on the DSv2 V1Scan path and row-level
    * statements on Spark's own resolution. */
  val EnabledKey = "spark.graft.catalog.nativeRewrite"
}

case class GraftTableRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private object GraftRelation {
    def unapply(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] = p match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((r, t))
        case _ => None
      }
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(GraftTableRewrite.EnabledKey)
        .forall(_.toBoolean)) return plan
    // READ relations are never touched here: [[GraftKeyedModeRule]] (an
    // optimizer rule) splices the native plan, keeps a keyed scan, or
    // rewrites a metadata COUNT(*), per the WHOLE plan's shape. The
    // analyzer can't decide — a DataFrame-API subtree (`spark.table(…)`)
    // analyzes standalone BEFORE the join/aggregate exists in any plan,
    // so an analysis-time shape check reached SQL only. Deferring is
    // free (a relation is a no-op until a scan is built), and it keeps
    // write-target relations intact for Spark's own insert resolution
    // and the row-level conversions below without any bookkeeping.
    // `_metadata` virtual columns over a DSv2 graft relation (TVF,
    // catalog identifier, or format("graft")): [[GraftTable]] declares
    // no V2 metadata columns, so an unresolved `_metadata` reference
    // would fail analysis — while the engine's own scan (a file-source
    // relation) has always served file_path / row_index /
    // file_modification_time (S7, and the per-file commit-instant
    // mtime). Splice the native plan at resolution time so Spark's own
    // metadata-column machinery serves the reference. The spliced
    // relations forgo keyed claims — per-file provenance needs the
    // file-source plan anyway.
    val planM =
      if (plan.exists(n => n.expressions.exists(metadataRef)))
        spliceForMetadata(plan)
      else plan
    planM.resolveOperatorsDown {
      case DeleteFromTable(GraftRelation(_, t), cond)
          if cond.resolved && noSubquery(cond, "DELETE") =>
        GraftDeleteCommand(t, toColumn(cond))

      case UpdateTable(GraftRelation(_, t), assignments, cond)
          if assignments.forall(_.resolved) && cond.forall(_.resolved) &&
            cond.forall(noSubquery(_, "UPDATE")) &&
            assignments.forall(a => noSubquery(a.value, "UPDATE SET")) =>
        val assigns = assignments.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new UnsupportedOperationException(
              s"UPDATE: only top-level columns can be assigned, got ${other.sql}")
          }
          name -> toColumn(a.value)
        }.toMap
        GraftUpdateCommand(t, assigns,
          cond.map(toColumn).getOrElse(org.apache.spark.sql.functions.lit(true)))

      case m @ MergeIntoTable(GraftRelation(_, t), source, cond,
            matched, notMatched, notMatchedBySource, _)
          if m.resolved =>
        convertMerge(t, source, cond, matched, notMatched, notMatchedBySource)

      // INSERT OVERWRITE under dynamic partitionOverwriteMode → the
      // writer's single-commit partition replacement (tombstone matched
      // partition tuples + append; untouched partitions carry forward)
      case o @ OverwritePartitionsDynamic(GraftRelation(_, t), query, _, _, _)
          if query.resolved && o.outputResolved =>
        GraftDynamicOverwriteCommand(t, query)

    }
  }

  /** Does `e` reference the `_metadata` virtual column (possibly
    * qualified, possibly a struct-field access)? */
  private def metadataRef(e: Expression): Boolean = e.exists {
    case u: UnresolvedAttribute =>
      u.nameParts.exists(_.equalsIgnoreCase("_metadata"))
    case _ => false
  }

  /** Replace every graft DSv2 READ relation with the engine scan's
    * analyzed plan so the file-source `_metadata` column resolves.
    *
    * No rebind Project: `SubqueryAlias.metadataOutput` propagates ONLY
    * over a LeafNode (or a nested alias), so qualified access
    * (`t._metadata.file_path`) needs the alias to sit DIRECTLY on the
    * scan's `LogicalRelation`. Instead, the enclosing plan's already-
    * resolved attribute references are rewritten by exprId to the
    * spliced plan's output (keeping the user's attribute case — Spark
    * preserves it in resolved refs, and the rewrite must not rename the
    * query's output columns). Write TARGETS keep their relation — the
    * V2 write resolution and this rule's row-level conversions need
    * them, and `_metadata` never resolves against a target anyway. */
  private def spliceForMetadata(plan: LogicalPlan): LogicalPlan = {
    val protectedRels: Seq[LogicalPlan] = plan.collect {
      case d: DeleteFromTable => d.table
      case u: UpdateTable => u.table
      case m: MergeIntoTable => m.targetTable
      case o: OverwritePartitionsDynamic => o.table
      case a: AppendData => a.table
      case o: OverwriteByExpression => o.table
      case i: InsertIntoStatement => i.table
    }.flatMap(_.collect { case r: DataSourceV2Relation => r: LogicalPlan })
    // SCOPE (ADVICE r17): splice only relations the unresolved
    // `_metadata` reference could actually resolve to. A QUALIFIED ref
    // (`t._metadata.x`) names its relation — an unrelated graft relation
    // in the same plan (the other join side, a different subquery) must
    // keep its keyed/SPJ claims. Matching over-approximates on purpose:
    // a false candidate only costs that relation its claims; a missed
    // one breaks resolution.
    val refQuals: Seq[Seq[String]] = plan.collect {
      case n if n.expressions.exists(metadataRef) =>
        n.expressions.flatMap(_.collect {
          case u: UnresolvedAttribute
              if u.nameParts.exists(_.equalsIgnoreCase("_metadata")) =>
            u.nameParts.takeWhile(!_.equalsIgnoreCase("_metadata"))
        })
    }.flatten
    val anyUnqualified = refQuals.isEmpty || refQuals.exists(_.isEmpty)
    val aliasesByRel =
      new java.util.IdentityHashMap[DataSourceV2Relation, Seq[String]]()
    def walk(p: LogicalPlan, names: Seq[String]): Unit = p match {
      case SubqueryAlias(ident, c) => walk(c, names :+ ident.name)
      case r: DataSourceV2Relation => aliasesByRel.put(r, names)
      case other => other.children.foreach(walk(_, names))
    }
    walk(plan, Seq.empty)
    def candidate(r: DataSourceV2Relation): Boolean =
      anyUnqualified || {
        val names = Option(aliasesByRel.get(r)).getOrElse(Seq.empty) ++
          r.table.name().split('.').lastOption
        refQuals.exists(q =>
          q.nonEmpty && names.exists(_.equalsIgnoreCase(q.last)))
      }
    val mapping =
      scala.collection.mutable.Map[org.apache.spark.sql.catalyst.expressions
        .ExprId, AttributeReference]()
    val replaced = plan.transformUp {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
          !protectedRels.exists(_ eq r) && candidate(r) &&
          !r.schema.fieldNames.exists(_.equalsIgnoreCase("_metadata")) =>
        val t = r.table.asInstanceOf[GraftTable]
        val inner = scala.util.Try(
          t.scanDF(spark).queryExecution.analyzed).toOption
        // exact-name match first, case-insensitive only when UNAMBIGUOUS
        // (ADVICE r17: a table with two columns differing only in case
        // under case-sensitive analysis must not wire both outputs to
        // one inner attribute — bail and keep the DSv2 relation)
        val innerOut = inner.map(_.output.collect {
          case a: AttributeReference => a
        }).getOrElse(Seq.empty)
        def lookup(name: String): Option[AttributeReference] =
          innerOut.find(_.name == name)
            .orElse(innerOut.filter(_.name.equalsIgnoreCase(name)) match {
              case Seq(one) => Some(one)
              case _ => None
            })
        val resolved = r.output.map(o => o -> lookup(o.name))
        if (inner.isEmpty || resolved.exists(_._2.isEmpty)) r
        else {
          resolved.foreach { case (o, a) => mapping(o.exprId) = a.get }
          inner.get
        }
    }
    if (mapping.isEmpty) plan
    else replaced.transformAllExpressions {
      case a: AttributeReference if mapping.contains(a.exprId) =>
        mapping(a.exprId).withName(a.name)
    }
  }

  private def noSubquery(e: Expression, what: String): Boolean = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"$what on a graft table: subqueries in the condition are not " +
          "supported — materialize the subquery and use MERGE, or the " +
          "Scala API")
    true
  }

  /** Resolved condition → Column over a FRESH scan: strip the stale
    * attribute bindings back to names (the writer re-resolves them
    * against its own tombstone-aware scan). */
  private def toColumn(e: Expression): Column =
    GraftShims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** MERGE INTO conversion. Two FAST paths keep their cheaper commits —
    * the canonical star-upsert (`IcebergWriter.merge`: O(source), no
    * target join) and the pure delete-by-key (`deleteEquality`) — and
    * every other resolved shape (conditional clauses, multiple clauses,
    * partial SET, non-equality ON, NOT MATCHED BY SOURCE) lowers to the
    * GENERAL single-commit MoR merge (`IcebergWriter.mergeInto`). */
  private def convertMerge(
      t: GraftTable, source: LogicalPlan, cond: Expression,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction],
      notMatchedBySource: Seq[MergeAction]): LogicalPlan = {
    val sourceOut = source.outputSet
    noSubquery(cond, "MERGE ON")

    // re-binding: resolved attrs → the runtime join inputs, by SIDE
    // (the writer builds fresh target/source frames; names re-resolve
    // against whichever side owned the original attribute)
    def bindFn(e: Expression): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => Column = {
      noSubquery(e, "MERGE")
      (tdf, sdf) =>
        GraftShims.column(e.transform {
          case a: AttributeReference =>
            GraftShims.expression(
              if (sourceOut.contains(a)) sdf(a.name) else tdf(a.name))
        })
    }
    def clauseOf(condO: Option[Expression], assignsO: Option[Seq[Assignment]])
        : IcebergWriter.MergeClause =
      IcebergWriter.MergeClause(
        condO.map(bindFn),
        assignsO.map(_.map { a =>
          val name = a.key match {
            case ar: AttributeReference => ar.name
            case other => throw new UnsupportedOperationException(
              s"MERGE: only top-level columns can be assigned, got ${other.sql}")
          }
          name -> bindFn(a.value)
        }.toMap))
    def general: LogicalPlan = GraftMergeIntoCommand(
      t, source, bindFn(cond),
      matched.map {
        case UpdateAction(c, as, _) => clauseOf(c, Some(as))
        case DeleteAction(c)        => clauseOf(c, None)
        case other => throw new UnsupportedOperationException(
          s"MERGE: unsupported WHEN MATCHED action $other")
      },
      notMatched.map {
        case InsertAction(c, as) => clauseOf(c, Some(as))
        case other => throw new UnsupportedOperationException(
          s"MERGE: unsupported WHEN NOT MATCHED action $other")
      },
      notMatchedBySource.map {
        case UpdateAction(c, as, _) => clauseOf(c, Some(as))
        case DeleteAction(c)        => clauseOf(c, None)
        case other => throw new UnsupportedOperationException(
          s"MERGE: unsupported WHEN NOT MATCHED BY SOURCE action $other")
      })

    // ---- fast-path detection (all-or-nothing; any mismatch → general)

    // ON clause as pure target.k = source.k conjuncts
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // (key name, target attr, source attr) per conjunct — nullability of
    // BOTH sides decides fast-path eligibility below: the fast paths
    // match keys NULL-SAFELY (<=>, the Iceberg equality-delete rule)
    // while the SQL ON condition `t.k = s.k` never matches NULLs, so a
    // NULL-keyed row on either side would silently delete/replace
    // NULL-keyed target rows.
    val keyPairsOpt: Option[Seq[(String, AttributeReference, AttributeReference)]] = {
      val keys = conjuncts(cond).map {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(
            a: AttributeReference, b: AttributeReference)
            if a.name.equalsIgnoreCase(b.name) &&
              (sourceOut.contains(a) ^ sourceOut.contains(b)) =>
          Some(if (sourceOut.contains(a)) (b.name, b, a) else (a.name, a, b))
        case _ => None
      }
      if (keys.forall(_.isDefined)) Some(keys.flatten) else None
    }
    val keyColsOpt: Option[Seq[String]] = keyPairsOpt.map(_.map(_._1))

    def assignMapOpt(as: Seq[Assignment]): Option[Map[String, Expression]] = {
      val entries = as.map(a => a.key match {
        case ar: AttributeReference => Some(ar.name.toLowerCase -> a.value)
        case _ => None
      })
      if (entries.forall(_.isDefined)) Some(entries.flatten.toMap) else None
    }

    val fast: Option[LogicalPlan] = keyPairsOpt.flatMap { keyPairs =>
      val keyCols = keyPairs.map(_._1)
      (matched, notMatched, notMatchedBySource) match {
        // delete-by-key: equality delete on the source's key tuples.
        // NULL-keyed source rows are PRE-FILTERED: under SQL `t.k = s.k`
        // they match nothing, while the equality delete's null-safe rule
        // would delete NULL-keyed target rows.
        case (Seq(DeleteAction(None)), Seq(), Seq()) =>
          val keyAttrs = keyCols.map(k =>
            source.output.find(_.name.equalsIgnoreCase(k)))
          if (keyAttrs.forall(_.isDefined)) {
            val attrs = keyAttrs.flatten
            val nullables = attrs.filter(_.nullable)
            val filtered: LogicalPlan =
              if (nullables.isEmpty) source
              else org.apache.spark.sql.catalyst.plans.logical.Filter(
                nullables.map(a =>
                  org.apache.spark.sql.catalyst.expressions.IsNotNull(a)
                    : Expression).reduce(
                  org.apache.spark.sql.catalyst.expressions.And(_, _)),
                source)
            Some(GraftMergeDeleteCommand(t,
              Project(attrs.map(a => a: NamedExpression), filtered)))
          } else None
        // star upsert: both branches assign the SAME full row per key.
        // Taken only when every key attribute is NON-NULLABLE on both
        // sides — with a nullable key, a NULL-keyed source row must
        // INSERT beside existing NULL-keyed target rows (SQL), but the
        // merge's null-safe equality delete would replace them; the
        // general path handles that correctly.
        case (Seq(UpdateAction(None, uas, _)), Seq(InsertAction(None, ias)), Seq())
            if keyPairs.forall { case (_, ta, sa) => !ta.nullable && !sa.nullable } =>
          (assignMapOpt(uas), assignMapOpt(ias)) match {
            case (Some(u), Some(i))
                if u.keySet == i.keySet &&
                  u.forall { case (k, v) => i(k).semanticEquals(v) } =>
              val tableCols = t.tableSchema.fieldNames.toSeq
              if (tableCols.forall(c => u.contains(c.toLowerCase))) {
                val projs: Seq[NamedExpression] =
                  tableCols.map(c => Alias(u(c.toLowerCase), c)())
                Some(GraftMergeCommand(t, Project(projs, source), keyCols))
              } else None
            case _ => None
          }
        case _ => None
      }
    }
    fast.getOrElse(general)
  }
}

/** DELETE FROM <graft table> WHERE <cond>. */
final case class GraftDeleteCommand(table: GraftTable, cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.withWrite(spark)(root => IcebergWriter.delete(spark, root, cond))
    Seq.empty
  }
}

/** UPDATE <graft table> SET ... WHERE <cond>. */
final case class GraftUpdateCommand(
    table: GraftTable, assigns: Map[String, Column], cond: Column)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.withWrite(spark)(root =>
      IcebergWriter.update(spark, root, cond, assigns))
    Seq.empty
  }
}

/** MERGE INTO <graft table> — upsert by key. `source` is the analyzed
  * effective-source plan (already projected to table columns). */
final case class GraftMergeCommand(
    table: GraftTable, source: LogicalPlan, keyCols: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    table.withWrite(spark)(root =>
      IcebergWriter.merge(spark, root, GraftShims.ofRows(spark, source), keyCols))
    Seq.empty
  }
}

/** General MERGE INTO — ordered conditional clauses through the writer's
  * single-commit MoR merge (tombstones + new files, no rewrites). */
final case class GraftMergeIntoCommand(
    table: GraftTable, source: LogicalPlan,
    on: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => Column,
    matched: Seq[IcebergWriter.MergeClause],
    notMatched: Seq[IcebergWriter.MergeClause],
    notMatchedBySource: Seq[IcebergWriter.MergeClause])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    table.withWrite(spark)(root =>
      IcebergWriter.mergeInto(spark, root, GraftShims.ofRows(spark, source),
        on, matched, notMatched, notMatchedBySource))
    Seq.empty
  }
}

/** MERGE ... WHEN MATCHED THEN DELETE — an Iceberg equality delete on
  * the source's key tuples (`keys` is the projected key plan). */
final case class GraftMergeDeleteCommand(table: GraftTable, keys: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(keys)
  override def run(spark: SparkSession): Seq[Row] = {
    table.withWrite(spark)(root =>
      IcebergWriter.deleteEquality(spark, root, GraftShims.ofRows(spark, keys)))
    Seq.empty
  }
}

/** Dynamic INSERT OVERWRITE — replace exactly the partitions the incoming
  * rows land in, one commit, no file rewrites of untouched partitions. */
final case class GraftDynamicOverwriteCommand(table: GraftTable, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    // the analyzer aligned the query to the table schema; rename
    // positionally so the writer's exact-name check sees table columns
    val df = GraftShims.ofRows(spark, query)
    val named = df.toDF(table.tableSchema.fieldNames.toIndexedSeq: _*)
    table.withWrite(spark)(root =>
      IcebergWriter.overwritePartitions(named, root))
    Seq.empty
  }
}

/** Shared relation-splice: replace a catalog relation with the engine
  * scan's analyzed plan, output re-bound to the relation's attribute ids
  * by (case-insensitive) name — the reference's bind-time replacement
  * (`iceberg_scan.cpp:305`) as a Catalyst rewrite. */
private[sql] object GraftSplice {
  def apply(spark: SparkSession, r: DataSourceV2Relation, t: GraftTable,
            forOptimizer: Boolean): LogicalPlan = {
    val analyzed = t.scanDF(spark).queryExecution.analyzed
    // An OPTIMIZER-stage splice arrives after the one-shot "Finish
    // Analysis" batch already ran on the enclosing plan and will never
    // run on this subtree: fold join hints into their Joins (the MoR
    // scan composition uses broadcast() hints — an unfolded ResolvedHint
    // reaching the planner is an INTERNAL_ERROR), strip SubqueryAlias
    // wrappers (no physical operator of their own), and lower
    // RuntimeReplaceable expressions, in FinishAnalysis's own order.
    // Everything else the subtree needs — pushdown, pruning, projection
    // collapse — lives in the fixed-point operator batch the splicing
    // rule runs in, so Catalyst still optimizes the spliced plan exactly
    // like an analysis-time splice.
    val inner =
      if (forOptimizer)
        org.apache.spark.sql.catalyst.optimizer.ReplaceExpressions(
          org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(
            org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(
              analyzed)))
      else analyzed
    val byName = inner.output.map(a => a.name.toLowerCase -> a).toMap
    val projs: Seq[NamedExpression] = r.output.map { o =>
      val src = byName.getOrElse(o.name.toLowerCase,
        throw new IllegalStateException(
          s"graft catalog: scan of ${t.name()} lost column '${o.name}'"))
      Alias(src, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(projs, inner)
  }
}

/** OPTIMIZER-stage claim/splice decision for catalog relations the
  * analyzer deferred ([[GraftTableRewrite]] keeps a relation whenever
  * Spark's SPJ flag is on and the table can plan keyed faithfully).
  *
  * Runs inside the fixed-point operator-optimization batch, where the
  * WHOLE query plan is visible regardless of surface syntax — a
  * DataFrame-API `spark.table(f).join(spark.table(d), ...)` analyzes its
  * subtrees standalone (the join doesn't exist in any analyzed plan the
  * relation sees), so analysis-time shape detection reached SQL only.
  * Here both surfaces converge, and the claim the scan takes is:
  *
  *  - "kgp"    — a co-partitioned graft⋈graft join or an aggregation
  *               covering the partition keys, with the relation feeding
  *               the consumer DIRECTLY: claim KeyGroupedPartitioning
  *               (zero-Exchange storage-partitioned plans);
  *  - "splits" — an equi-join on a partition source against a
  *               non-co-partitioned side (runtime dim-side pruning), or
  *               a filter touching a partition source (entry pruning /
  *               zero-split lookups): keep the keyed scan but pack
  *               splits to `maxPartitionBytes`, claiming nothing;
  *  - neither  — splice the native plan (vectorized ManifestFileIndex
  *               scan): a keyed claim on a plain scan would collapse a
  *               bucket(8) table to 8 tasks regardless of size.
  *
  * By this stage "Finish Analysis" has folded join hints into the Join
  * node and eliminated SubqueryAlias, so the directness walk sees the
  * shapes it tests (the alias/hint arms stay for robustness — the rule
  * also runs on subquery plans via OptimizeSubqueries, whose rewrite
  * timing is version-dependent). Decisions are deterministic over a
  * given plan, so the fixed point converges: a tag only flips when a
  * sibling relation splices out from under an alignment check, which is
  * monotone. */
case class GraftKeyedModeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.getOption(GraftTableRewrite.EnabledKey)
        .forall(_.toBoolean)) return plan
    val hasGraft = plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
      case _ => false
    }
    if (!hasGraft) return plan
    plan.transformDown {
      // metadata aggregates: a COUNT(*) / MIN / MAX combination over a
      // graft relation answers from manifest stats when the snapshot
      // carries no delete entry that could shadow rows — the 100-TB
      // `SELECT count(*), max(ts)` costs one manifest decode, zero data
      // I/O. Round 16 extends the reach to the two dashboard shapes:
      // Filters whose every attribute is an IDENTITY partition source
      // (the predicate is then constant per file — evaluate it on each
      // entry's partition tuple: true keeps ALL the file's rows, false
      // none), and GROUP BY on identity partition sources (groups =
      // distinct live partition tuples, counts = per-tuple record_count
      // sums). MIN/MAX serve fixed-width exact-bound types only
      // (int/long/date/timestamp; strings may be truncated, float/double
      // bounds exclude NaN which Spark sorts ABOVE all) and require
      // EVERY surviving file to record the column's bounds — any gap
      // (all-null file, metrics off, non-identity transform, partial
      // partition tuple, spec-evolution ambiguity) falls through to the
      // normal plan.
      case agg: Aggregate if agg.aggregateExpressions.nonEmpty &&
          agg.groupingExpressions.forall(groupingShape) &&
          agg.aggregateExpressions.forall(e =>
            metadataServable(e) || constOutput(e) ||
              groupingPassthrough(e, agg.groupingExpressions)) =>
        relationAndFilters(agg.child)
          .flatMap { case (t, fs) => serveMetadata(agg, t, fs) }
          .getOrElse(agg)
      // `CAST(ts AS DATE) cmp DATE'…'` filters over a graft relation:
      // AND the implied raw-timestamp range onto the condition (exact —
      // the cast is monotone and UTC-aligned by the guard), so the
      // keyed scan's pushdown and the parquet reader's row-group
      // pruning see plain comparisons they can act on. The original
      // cast conjunct stays (residual semantics unchanged); fixpoint
      // converges because implied conjuncts already present are never
      // re-added.
      case f: Filter if f.child.exists {
            case r: DataSourceV2Relation => r.table.isInstanceOf[GraftTable]
            case _ => false
          } =>
        val implied = castDateImplied(f.condition)
        if (implied.isEmpty) f
        else Filter(implied.foldLeft(f.condition)(And(_, _)), f.child)
      case r0: DataSourceV2Relation if r0.table.isInstanceOf[GraftTable] =>
        // catalog-less relations (format("graft"), TVF fallbacks) get
        // the transform-function resolver so V2ScanPartitioning can
        // bind their bucket/truncate transforms — without it a kept
        // keyed relation would claim KeyGroupedPartitioning that never
        // converts to a catalyst partitioning, and SPJ never engages
        val r = if (r0.catalog.isEmpty)
          r0.copy(catalog = Some(GraftPathFunctionCatalog)) else r0
        val t = r.table.asInstanceOf[GraftTable]
        // tables that can't plan keyed faithfully (MoR shapes the keyed
        // reader doesn't serve, non-parquet, name mapping, …) splice
        // straight to the native plan — tagging them would land on the
        // V1 row bridge, a performance cliff
        if (!GraftKeyedScan.enabled(spark) || t.keyedPlan(spark).isEmpty)
          GraftSplice(spark, r, t, forOptimizer = true)
        else keyedMode(plan, r0, t) match {
          case Some(mode) =>
            if ((r eq r0) &&
                Option(r.options.get(GraftKeyedScan.ModeOption)).contains(mode)) r
            else r.copy(options = withMode(r.options, mode))
          case None => GraftSplice(spark, r, t, forOptimizer = true)
        }
    }
  }

  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
  import org.apache.spark.sql.types.{BooleanType, DataType, DateType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

  /** Raw-timestamp range conjuncts implied by `CAST(ts AS DATE)`
    * comparisons in `cond` that aren't already conjuncts. UTC-safe only
    * (TimestampType casts run through the cast's resolved session
    * zone); exact, never approximate — `cast(ts) >= d` ⇔ `ts >= d 00:00`
    * etc., so AND-ing them preserves semantics while giving the pushdown
    * a shape it can translate. */
  private def castDateImplied(cond: Expression): Seq[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo => CEq, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal => CLit}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def castTs(x: Expression): Option[AttributeReference] = x match {
      case c @ Cast(a: AttributeReference, DateType, _, _) => a.dataType match {
        case TimestampNTZType => Some(a)
        case TimestampType if c.timeZoneId.exists { z =>
            val rules = java.time.ZoneId.of(z).getRules
            rules.isFixedOffset &&
              rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
          } => Some(a)
        case _ => None
      }
      case _ => None
    }
    def dayLit(x: Expression): Option[Long] = x match {
      case CLit(d: java.lang.Integer, DateType) => Some(d.longValue)
      case _ => None
    }
    def range(a: AttributeReference, op: String, d: Long): Seq[Expression] = {
      def ts(v: Long) = CLit(v, a.dataType)
      val lo = d * 86400000000L
      val next = (d + 1) * 86400000000L
      op match {
        case "="  => Seq(GreaterThanOrEqual(a, ts(lo)), LessThan(a, ts(next)))
        case ">=" => Seq(GreaterThanOrEqual(a, ts(lo)))
        case ">"  => Seq(GreaterThanOrEqual(a, ts(next)))
        case "<=" => Seq(LessThan(a, ts(next)))
        case "<"  => Seq(LessThan(a, ts(lo)))
        case _    => Seq.empty
      }
    }
    val cjs = conjuncts(cond)
    val implied = cjs.flatMap {
      case CEq(c, l) => (castTs(c), dayLit(l)) match {
        case (Some(a), Some(d)) => range(a, "=", d)
        case _ => (castTs(l), dayLit(c)) match {
          case (Some(a), Some(d)) => range(a, "=", d)
          case _ => Seq.empty
        }
      }
      case GreaterThanOrEqual(c, l) => (castTs(c), dayLit(l)) match {
        case (Some(a), Some(d)) => range(a, ">=", d)
        case _ => (castTs(l), dayLit(c)) match {
          case (Some(a), Some(d)) => range(a, "<=", d)
          case _ => Seq.empty
        }
      }
      case GreaterThan(c, l) => (castTs(c), dayLit(l)) match {
        case (Some(a), Some(d)) => range(a, ">", d)
        case _ => (castTs(l), dayLit(c)) match {
          case (Some(a), Some(d)) => range(a, "<", d)
          case _ => Seq.empty
        }
      }
      case LessThanOrEqual(c, l) => (castTs(c), dayLit(l)) match {
        case (Some(a), Some(d)) => range(a, "<=", d)
        case _ => (castTs(l), dayLit(c)) match {
          case (Some(a), Some(d)) => range(a, ">=", d)
          case _ => Seq.empty
        }
      }
      case LessThan(c, l) => (castTs(c), dayLit(l)) match {
        case (Some(a), Some(d)) => range(a, "<", d)
        case _ => (castTs(l), dayLit(c)) match {
          case (Some(a), Some(d)) => range(a, ">", d)
          case _ => Seq.empty
        }
      }
      case _ => Seq.empty
    }
    implied.filterNot(i => cjs.exists(_.semanticEquals(i)))
      .foldLeft(Seq.empty[Expression]) { (acc, i) =>
        if (acc.exists(_.semanticEquals(i))) acc else acc :+ i
      }
  }

  /** Bounds of these types are fixed-width EXACT values in manifests. */
  private def boundServable(dt: DataType): Boolean =
    graft.iceberg.MetaAgg.boundServable(dt)

  /** Is this output a metadata-servable aggregate under an Alias —
    * `count(*)` (non-null literals, non-distinct, unfiltered),
    * `count(col)` (served from recorded null counts — round 16), or
    * MIN/MAX of a plain column of an exact-bound type? */
  private def metadataServable(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      // count(DISTINCT col[, col…]) is admitted when every child is a
      // plain attribute — served later ONLY if each resolves (by
      // lineage) to a VALUE-EXACT partition source, whose distinct
      // count is exactly the number of distinct non-null stored tuple
      // values over the surviving entries (VERDICT r16 #2)
      if (ae.isDistinct)
        ae.filter.isEmpty && (ae.aggregateFunction match {
          case c: Count =>
            c.children.nonEmpty &&
              c.children.forall(ch => ch.isInstanceOf[AttributeReference] ||
                periodShape(ch).isDefined) // r18: distinct periods
          case _ => false
        })
      else ae.filter.isEmpty && (ae.aggregateFunction match {
        case c: Count =>
          c.children.nonEmpty && c.children.forall {
            case l: Literal => l.value != null
            case _: AttributeReference => c.children.size == 1
            case _ => false
          }
        case m: Min => m.child.isInstanceOf[AttributeReference] &&
          graft.iceberg.MetaAgg.minServable(m.child.dataType)
        case m: Max => m.child.isInstanceOf[AttributeReference] &&
          boundServable(m.child.dataType)
        case _ => false
      })
    case _ => false
  }

  /** Resolve `a` by exprId through the Project/Alias chain to the graft
    * relation's OWN output attribute. A rename must map to the renamed
    * SOURCE column, never to a physical column that happens to share the
    * name — `SELECT max(x) FROM (SELECT y AS x FROM t)` aggregates y,
    * and a name-based lookup against the snapshot schema would serve
    * column x's manifest bounds (round-15 verdict wrong answer). */
  private def resolveToRelation(p: LogicalPlan, a: AttributeReference)
      : Option[AttributeReference] = p match {
    case r: DataSourceV2Relation =>
      r.output.find(_.exprId == a.exprId)
        .collect { case ar: AttributeReference => ar }
    case SubqueryAlias(_, child) => resolveToRelation(child, a)
    case Filter(_, child) => resolveToRelation(child, a)
    case Project(list, child) =>
      list.find(_.exprId == a.exprId).flatMap {
        case ar: AttributeReference => resolveToRelation(child, ar)
        case Alias(ar: AttributeReference, _) => resolveToRelation(child, ar)
        case _ => None // computed projection — metadata can't serve it
      }
    case _ => None
  }

  /** Grouping-expression shapes the metadata path can evaluate per
    * file: a bare attribute, or a calendar-period expression over one
    * column — `CAST(ts AS DATE)`, `date_trunc(fmt, ts)`,
    * `trunc(date, fmt)`, `year/month/quarter(…)` (decided later against
    * the partition transforms). */
  private def groupingShape(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Month, Quarter, TruncDate, TruncTimestamp, Year}
    e match {
      case _: AttributeReference => true
      case _: Cast | _: TruncTimestamp | _: TruncDate |
           _: Year | _: Month | _: Quarter =>
        e.deterministic && e.references.size == 1
      case _ => false
    }
  }

  /** A constant output column (`SELECT 'tag' AS which, count(*) …`) —
    * servable verbatim alongside metadata aggregates. */
  private def constOutput(e: NamedExpression): Boolean = e match {
    case Alias(_: Literal, _) => true
    case _ => false
  }

  /** Is `e` a grouping expression surfaced in the output — the bare
    * expression or an alias of it? */
  private def groupingPassthrough(
      e: NamedExpression, groups: Seq[Expression]): Boolean = e match {
    case a: AttributeReference => groups.exists(_.semanticEquals(a))
    case Alias(inner, _) => groups.exists(_.semanticEquals(inner))
    case _ => false
  }

  /** The graft table the aggregate's child reaches through
    * cardinality-preserving nodes, plus every Filter condition met on
    * the way (paired with the Filter's OWN child so its attributes
    * resolve at the right depth). */
  private def relationAndFilters(p: LogicalPlan)
      : Option[(GraftTable, Seq[(Expression, LogicalPlan)])] = p match {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some((r.table.asInstanceOf[GraftTable], Seq.empty))
    case SubqueryAlias(_, child) => relationAndFilters(child)
    case Project(_, child) => relationAndFilters(child)
    case Filter(cond, child) =>
      relationAndFilters(child).map { case (t, fs) => (t, (cond, child) +: fs) }
    case _ => None
  }

  /** min/max of field `id` across tuple partials: Some(Some(v)) =
    * served; Some(None) = no surviving non-null values → NULL; None = a
    * contributing file lacks the bound without being provably all-null
    * (metrics off) → can't serve exactly. All-null partials contribute
    * nothing to MIN/MAX (SQL ignores nulls) and are skipped instead of
    * bailing (round 16: sparse columns stay servable). */
  private def boundFold(
      ts: Seq[graft.iceberg.TupleAgg],
      id: Int, lower: Boolean): Option[Option[Any]] = {
    val contributing = ts.filterNot(_.allNull(id))
    if (contributing.isEmpty) return Some(None)
    // only the REQUESTED side must be present on every contributor:
    // strings fold min-only (`hi` absent by construction, r18), and an
    // incomparable (hostile) bound value refuses instead of throwing
    val vs = contributing.map(t => if (lower) t.lo.get(id) else t.hi.get(id))
    if (contributing.exists(_.poisoned(id)) || vs.exists(_.isEmpty)) None
    else graft.iceberg.MetaAgg.extremum(vs.flatten, lower).map(Some(_))
  }

  /** Non-null count of field `id` across tuple partials from recorded
    * null counts (`count(col)` semantics) — None when any contributing
    * entry omitted the count (can't serve exactly). */
  private def nonNullFold(
      ts: Seq[graft.iceberg.TupleAgg], id: Int): Option[Long] = {
    val per = ts.map(_.nonNull.get(id))
    if (per.exists(_.isEmpty)) None else Some(per.map(_.get).sum)
  }

  /** Relation-attr names whose null counts / bounds the aggregates read
    * — the columns the tuple-stat fold must carry. */
  private def neededColsOf(agg: Aggregate): Seq[String] =
    agg.aggregateExpressions.flatMap {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct =>
        (ae.aggregateFunction match {
          case c: Count => c.children.collect {
            case ar: AttributeReference => ar }
          case m: Min => m.child match {
            case ar: AttributeReference => Seq(ar); case _ => Seq.empty }
          case m: Max => m.child match {
            case ar: AttributeReference => Seq(ar); case _ => Seq.empty }
          case _ => Seq.empty
        }).flatMap(ar => resolveToRelation(agg.child, ar).map(_.name))
      case _ => Seq.empty
    }.distinct

  /** Bind `a0` by LINEAGE (exprId down to the relation output through
    * `chain`), then map that physical attribute's name to its Iceberg
    * field id — exact match first, case-insensitive only when
    * unambiguous (case-sensitive analysis may distinguish columns
    * differing only in case). A rename colliding with another physical
    * column must serve the RENAMED source, never the collision
    * (round-15 verdict wrong answer). */
  private def fieldIdOf(
      chain: LogicalPlan, a0: AttributeReference,
      cols: Seq[graft.iceberg.IcebergModel.Column]): Option[Int] =
    resolveToRelation(chain, a0).flatMap(a =>
      graft.iceberg.MetaAgg.columnByName(cols, a.name).map(_.id))

  // --- calendar-period expression shapes (shared by the GROUP BY and
  // count(DISTINCT …) recognizers and the servability pre-check) ---
  import org.apache.spark.sql.catalyst.expressions.{Cast, Month, Quarter, TruncDate, TruncTimestamp, Year}
  private def tsSide(x: Expression): Option[AttributeReference] = x match {
    case ar: AttributeReference => Some(ar)
    case Cast(ar: AttributeReference,
              TimestampType | TimestampNTZType, _, _) => Some(ar)
    case _ => None
  }
  private def dateSide(x: Expression): Option[AttributeReference] = x match {
    case ar: AttributeReference if ar.dataType == DateType => Some(ar)
    case Cast(ar: AttributeReference, DateType, _, _) => Some(ar)
    case _ => None
  }
  private def truncKey(fmt: Any): Option[String] =
    Option(fmt).map(_.toString.toLowerCase(java.util.Locale.ROOT)).collect {
      case "month" | "mon" | "mm" => "month"
      case "year" | "yyyy" | "yy" => "year"
      case "quarter"              => "quarter"
      case "week"                 => "week"
      case "day" | "dd"           => "day"
      case "hour"                 => "hour"
    }
  /** (source attribute, out-kind) of a supported period expression.
    * `date_trunc('hour', ts)` is admitted (r18, VERDICT r17 #4): an
    * hour-transform file's ordinal maps to exactly one hour. An OUTER
    * cast of a timestamp-valued period to TIMESTAMP_NTZ renders the
    * same micros (serving requires the UTC session zone anyway), so
    * `CAST(date_trunc(…, ts) AS TIMESTAMP_NTZ)` serves too. */
  private def periodShape(e: Expression): Option[(AttributeReference, String)] =
    e match {
      case Cast(ar: AttributeReference, DateType, _, _) =>
        Some((ar, "date"))
      case Cast(inner, TimestampNTZType, _, _) =>
        periodShape(inner).filter(_._2.endsWith("-ts"))
      case TruncTimestamp(Literal(fmt, StringType), tse, _) =>
        for (k <- truncKey(fmt); ar <- tsSide(tse)) yield (ar, s"$k-ts")
      case TruncDate(de, Literal(fmt, StringType)) =>
        // dates carry no hours — trunc(date, 'hour') is NULL in Spark
        for (k <- truncKey(fmt) if k != "hour"; ar <- dateSide(de))
          yield (ar, s"$k-date")
      case Year(de)    => dateSide(de).map((_, "year-int"))
      case Month(de)   => dateSide(de).map((_, "month-int"))
      case Quarter(de) => dateSide(de).map((_, "quarter-int"))
      case _ => None
    }

  /** Route to the cheapest exact metadata answer: unfiltered/ungrouped
    * goes through the O(1) list-stats path; anything with Filters or
    * GROUP BY evaluates per entry on identity partition tuples. */
  private def serveMetadata(
      agg: Aggregate, t: GraftTable,
      filters: Seq[(Expression, LogicalPlan)]): Option[LogicalPlan] = {
    val hasDistinct = agg.aggregateExpressions.exists {
      case Alias(ae: AggregateExpression, _) => ae.isDistinct
      case _ => false
    }
    if (filters.isEmpty && agg.groupingExpressions.isEmpty && !hasDistinct)
      metadataAggregate(agg, agg.child, t)
    else metadataGrouped(agg, t, filters)
  }

  /** The one-row literal plan answering the GLOBAL unfiltered `agg`
    * from manifest stats, or None when metadata can't serve it exactly.
    * `aggChild` is the plan between the Aggregate and the relation —
    * attribute lineage for the MIN/MAX field-id binding is resolved
    * through it. */
  private def metadataAggregate(
      agg: Aggregate, aggChild: LogicalPlan, t: GraftTable)
      : Option[LogicalPlan] = {
    // count(*)-only: the O(1) manifest-list stats path suffices —
    // MIN/MAX and count(col) both need per-entry stats
    val onlyStarCounts = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) => ae.aggregateFunction match {
        case c: Count => !ae.isDistinct && ae.filter.isEmpty &&
          c.children.forall(_.isInstanceOf[Literal])
        case _ => false
      }
      case Alias(_: Literal, _) => true // constant tag column rides along
      case _ => false
    }
    if (onlyStarCounts) return t.metadataCount(spark).map { n =>
      Project(agg.aggregateExpressions.map {
        case a @ Alias(l: Literal, _) =>
          Alias(l, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        case a: Alias =>
          Alias(Literal(n), a.name)(exprId = a.exprId, qualifier = a.qualifier)
        case other => other
      }, OneRowRelation())
    }
    t.metadataLive(spark, neededColsOf(agg)).flatMap { case (tuples, cols, _) =>
      // a tainted tuple (a live equality delete may still match it,
      // r19) makes every global aggregate an upper bound — bail; the
      // filtered/grouped path below can still serve when its filters
      // provably exclude the tainted tuples
      if (tuples.exists(_.tainted)) return None
      val total = tuples.map(_.rows).sum
      def boundOf(a0: AttributeReference, lower: Boolean)
          : Option[Option[Any]] =
        fieldIdOf(aggChild, a0, cols)
          .flatMap(id => boundFold(tuples, id, lower))
      val outputs = agg.aggregateExpressions.map {
        case a @ Alias(l: Literal, _) =>
          Some(Alias(l, a.name)(exprId = a.exprId, qualifier = a.qualifier))
        case a @ Alias(ae: AggregateExpression, _) =>
          val lit: Option[Literal] = ae.aggregateFunction match {
            case c: Count => c.children match {
              // count(col): Σ(record_count − null_count), exact when
              // every live entry records the column's null count
              case Seq(ar: AttributeReference) =>
                fieldIdOf(aggChild, ar, cols)
                  .flatMap(id => nonNullFold(tuples, id))
                  .map(Literal(_))
              case _ => Some(Literal(total))
            }
            case m: Min =>
              boundOf(m.child.asInstanceOf[AttributeReference], lower = true)
                .map(v => Literal(v.orNull, m.child.dataType))
            case m: Max =>
              boundOf(m.child.asInstanceOf[AttributeReference], lower = false)
                .map(v => Literal(v.orNull, m.child.dataType))
            case _ => None
          }
          lit.map(l =>
            Alias(l, a.name)(exprId = a.exprId, qualifier = a.qualifier))
        case _ => None
      }
      if (outputs.exists(_.isEmpty)) None
      else Some(Project(outputs.map(_.get), OneRowRelation()))
    }
  }

  /** Metadata answer for the FILTERED and/or GROUPED aggregate shapes
    * (VERDICT r15 #3/#4): every filter attribute and every grouping
    * column must be an IDENTITY partition source, so each predicate is
    * constant per file (all of a file's rows share its partition tuple)
    * and each group is a set of whole files. Exactness guards, each a
    * fall-through to the normal plan:
    *  - snapshot is delete-free ([[GraftTable.metadataLive]]);
    *  - every spec (partition evolution) that names a used field
    *    defines it as identity of the SAME source column;
    *  - every live entry carries a convertible value for every used
    *    field (older-spec entries without it are unevaluable);
    *  - filter conditions are deterministic and subquery-free;
    *  - MIN/MAX columns follow the global path's exact-bound rules,
    *    applied per group. */
  private def metadataGrouped(
      agg: Aggregate, t: GraftTable,
      filters: Seq[(Expression, LogicalPlan)]): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BasePredicate, BoundReference, PlanExpression, Predicate => CPredicate}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

    t.metadataLive(spark, neededColsOf(agg)).flatMap {
        case (tuples0, cols, specsById) =>
      val typeById = cols.map(c => c.id -> c.dataType).toMap
      // VALUE-EXACT partition fields: identity on any source, plus
      // day/days on a DATE source — day(date) stores the epoch-day
      // ordinal, which IS the date value, so every row of a file shares
      // the stored value exactly like identity (the most common 100-TB
      // layout: a day-partitioned date column). day on TIMESTAMP is NOT
      // exact (rows span the day) and falls through here.
      def valueExact(pf: graft.iceberg.IcebergModel.PartitionFieldSpec,
                     dt: DataType): Boolean =
        pf.transform.equalsIgnoreCase("identity") ||
          ((pf.transform.equalsIgnoreCase("day") ||
            pf.transform.equalsIgnoreCase("days")) && dt == DateType)
      // by lowercase SOURCE column name — duplicates drop out
      val idBySrc: Map[String, (graft.iceberg.IcebergModel.PartitionFieldSpec,
                                DataType)] =
        t.partitionFields
          .groupBy(_._2.toLowerCase)
          .collect { case (src, Seq((pf, _))) =>
            typeById.get(pf.sourceId)
              .filter(dt => valueExact(pf, dt))
              .map(dt => src -> (pf, dt))
          }.flatten.toMap

      // INTERVAL-DECIDABLE fields: day/hour/month/year on a timestamp
      // source (and month/year on a date source) store an ordinal whose
      // rows span a known [lo, hiInc] source-value range — a MONOTONE
      // comparison against a literal evaluates identically at both
      // endpoints exactly when it is constant over the whole file, so
      // `WHERE ts >= X AND ts < Y` on a day-partitioned fact decides
      // per file when the bounds are period-aligned, and a STRADDLING
      // file provably falls through to the normal plan.
      val intervalBySrc: Map[String,
          (graft.iceberg.IcebergModel.PartitionFieldSpec, DataType, String)] =
        t.partitionFields
          .groupBy(_._2.toLowerCase)
          .collect { case (src, Seq((pf, _))) =>
            val kind = pf.transform.toLowerCase match {
              case "day" | "days"     => "day"
              case "hour" | "hours"   => "hour"
              case "month" | "months" => "month"
              case "year" | "years"   => "year"
              case _ => ""
            }
            typeById.get(pf.sourceId).collect {
              case dt @ (TimestampType | TimestampNTZType)
                  if kind.nonEmpty => src -> (pf, dt, kind)
              case DateType if kind == "month" || kind == "year" =>
                src -> (pf, DateType, kind)
            }
          }.flatten.toMap

      // resolve an aggregate-level attribute to its identity field
      def identityOf(chain: LogicalPlan, a: AttributeReference)
          : Option[String] =
        resolveToRelation(chain, a).map(_.name.toLowerCase)
          .filter(idBySrc.contains)

      // grouping columns: each must resolve to a PER-FILE-CONSTANT
      // value — a value-exact field itself (ExactVal), or a calendar
      // PERIOD of a date/timestamp partition source (PeriodVal):
      // `CAST(ts AS DATE)`, `date_trunc('month'|'year'|…, ts)`,
      // `trunc(date, fmt)`, `year/month/quarter(…)`. The period is
      // constant per file exactly when the file's ordinal range maps
      // into ONE period — a day file serves monthly rollups, a month
      // file does not serve daily ones (provable fall-through). The
      // optimizer's PullOutGroupingExpressions rewrites computed group
      // keys into a `_groupingexpression` Project alias, so the shape
      // is also recognized down the Project chain. Expressions touching
      // TimestampType go through the session zone — admitted only when
      // that zone is UTC (the ordinal→period arithmetic below is UTC);
      // NTZ and DATE shapes are zone-free.
      sealed trait GroupVal
      final case class ExactVal(src: String) extends GroupVal
      // src: lowercase source column (idBySrc/intervalBySrc key);
      // fieldName: the partition field whose stored value is read;
      // srcKind: ordinal domain ("day"/"hour"/"month"/"year" interval
      // ordinals, "day" epoch-days for exact DATE sources, "micros"
      // for exact TIMESTAMP sources); out: requested period rendering.
      final case class PeriodVal(
          src: String, fieldName: String, srcKind: String, out: String,
          exact: Boolean) extends GroupVal
      lazy val sessionTzUtc: Boolean = {
        val rules = java.time.ZoneId
          .of(spark.sessionState.conf.sessionLocalTimeZone).getRules
        rules.isFixedOffset &&
          rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
      }
      import org.apache.spark.sql.catalyst.expressions.{Cast, Month, Quarter, TruncDate, TruncTimestamp, Year}

      // the [loDay, hiDay] EPOCH-DAY range of one stored value
      def dayRangeOf(kind: String, v: Int): (Long, Long) = {
        def monthStart(m: Int) = java.time.LocalDate.of(
          1970 + Math.floorDiv(m, 12), Math.floorMod(m, 12) + 1, 1)
        kind match {
          case "day"  => (v.toLong, v.toLong)
          case "hour" => val d = Math.floorDiv(v, 24).toLong; (d, d)
          case "month" => (monthStart(v).toEpochDay,
                           monthStart(v).plusMonths(1).toEpochDay - 1)
          case _ => (java.time.LocalDate.of(1970 + v, 1, 1).toEpochDay,
                     java.time.LocalDate.of(1971 + v, 1, 1).toEpochDay - 1)
        }
      }
      def dayRangeOfAny(srcKind: String, v: Any): Option[(Long, Long)] =
        (srcKind, v) match {
          case ("micros", l: java.lang.Long) =>
            val d = Math.floorDiv(l.longValue, 86400000000L); Some((d, d))
          case ("micros", _) => None
          case (_, i: java.lang.Integer) => Some(dayRangeOf(srcKind, i.intValue))
          case _ => None
        }
      // the period's rendered value when the day range maps into ONE
      // period; None = the file spans periods (or odd value) → bail.
      // "hour-ts" (r18) is finer than a day: it serves only from hour
      // ordinals and micros-exact sources — every coarser transform's
      // range spans 24+ hours and provably falls through.
      def periodValue(srcKind: String, out: String, v: Any): Option[Any] =
        if (out == "hour-ts") (srcKind, v) match {
          case ("hour", i: java.lang.Integer) =>
            Some(Long.box(i.longValue * 3600000000L))
          case ("micros", l: java.lang.Long) =>
            Some(Long.box(Math.floorDiv(l.longValue, 3600000000L) * 3600000000L))
          case _ => None
        }
        else dayRangeOfAny(srcKind, v).flatMap { case (loD, hiD) =>
          import java.time.LocalDate
          val a = LocalDate.ofEpochDay(loD)
          val b = LocalDate.ofEpochDay(hiD)
          def date(d: LocalDate): Any = Int.box(d.toEpochDay.toInt)
          def micros(d: LocalDate): Any = Long.box(d.toEpochDay * 86400000000L)
          out match {
            case "date" | "day-date" =>
              if (loD == hiD) Some(date(a)) else None
            case "day-ts" => if (loD == hiD) Some(micros(a)) else None
            case "week-date" | "week-ts" =>
              val wa = a.minusDays(a.getDayOfWeek.getValue - 1L)
              val wb = b.minusDays(b.getDayOfWeek.getValue - 1L)
              if (wa == wb)
                Some(if (out == "week-date") date(wa) else micros(wa))
              else None
            case "month-date" | "month-ts" | "month-int" =>
              if (a.getYear == b.getYear && a.getMonthValue == b.getMonthValue) {
                if (out == "month-int") Some(Int.box(a.getMonthValue))
                else {
                  val s = a.withDayOfMonth(1)
                  Some(if (out == "month-date") date(s) else micros(s))
                }
              } else None
            case "quarter-date" | "quarter-ts" | "quarter-int" =>
              val qa = (a.getMonthValue - 1) / 3
              val qb = (b.getMonthValue - 1) / 3
              if (a.getYear == b.getYear && qa == qb) {
                if (out == "quarter-int") Some(Int.box(qa + 1))
                else {
                  val s = java.time.LocalDate.of(a.getYear, qa * 3 + 1, 1)
                  Some(if (out == "quarter-date") date(s) else micros(s))
                }
              } else None
            case "year-date" | "year-ts" | "year-int" =>
              if (a.getYear == b.getYear) {
                if (out == "year-int") Some(Int.box(a.getYear))
                else {
                  val s = java.time.LocalDate.of(a.getYear, 1, 1)
                  Some(if (out == "year-date") date(s) else micros(s))
                }
              } else None
            case _ => None
          }
        }

      // any TimestampType node evaluates through the session zone
      def zoneOk(e: Expression): Boolean =
        sessionTzUtc || !e.exists(n =>
          scala.util.Try(n.dataType == TimestampType).getOrElse(false))
      def periodOf(chain: LogicalPlan, e: Expression): Option[GroupVal] =
        periodShape(e).filter(_ => zoneOk(e)).flatMap { case (ar, out) =>
          resolveToRelation(chain, ar).map(_.name.toLowerCase).flatMap {
            src =>
              intervalBySrc.get(src)
                .map { case (pf, _, kind) =>
                  PeriodVal(src, pf.name, kind, out, exact = false) }
                .orElse(idBySrc.get(src).collect {
                  case (pf, DateType) =>
                    PeriodVal(src, pf.name, "day", out, exact = true)
                  case (pf, TimestampType | TimestampNTZType) =>
                    PeriodVal(src, pf.name, "micros", out, exact = true)
                })
          }
        }
      def periodAliasOf(p: LogicalPlan, a: AttributeReference)
          : Option[GroupVal] = p match {
        case SubqueryAlias(_, c) => periodAliasOf(c, a)
        case Filter(_, c) => periodAliasOf(c, a)
        case Project(list, c) =>
          list.find(_.exprId == a.exprId).flatMap {
            case ar: AttributeReference => periodAliasOf(c, ar)
            case Alias(ar: AttributeReference, _) => periodAliasOf(c, ar)
            case Alias(inner, _) => periodOf(c, inner)
            case _ => None
          }
        case _ => None
      }
      val groupExprs = agg.groupingExpressions
      val groupSpecs: Seq[GroupVal] = groupExprs.map {
        case a: AttributeReference =>
          identityOf(agg.child, a).map(ExactVal(_))
            .orElse(periodAliasOf(agg.child, a))
            .getOrElse(return None)
        // computed group keys stay INLINE when this rule runs (the
        // optimizer's PullOutGroupingExpressions batch comes later);
        // the pulled-out shape is handled by periodAliasOf above
        case e =>
          periodOf(agg.child, e).getOrElse(return None)
      }
      val groupSrcs = groupSpecs.collect { case ExactVal(s) => s }

      // classify each filter conjunct: VALUE-EXACT (every attribute an
      // identity source — any deterministic expression evaluates on the
      // partition tuple) or INTERVAL (a bare monotone comparison / null
      // check on an interval field). Anything else → normal plan.
      import org.apache.spark.sql.catalyst.expressions.{EqualTo => CEq, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
      // `cast = true`: the comparison is `CAST(ts AS DATE) op DATE'…'`
      // — decided in the EPOCH-DAY domain, where a day (or hour) file's
      // range collapses to ONE value, so unlike raw-timestamp equality
      // the cast equality decides BOTH ways (VERDICT r16 #1: the most
      // common dashboard filter over a day-partitioned fact).
      final case class IntervalCheck(
          fieldName: String, dt: DataType, kind: String, op: String,
          lit: Long, cast: Boolean = false)
      def conjunctsOf(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjunctsOf(l) ++ conjunctsOf(r)
        case other => Seq(other)
      }
      def intervalOf(chain: LogicalPlan, a: AttributeReference)
          : Option[(graft.iceberg.IcebergModel.PartitionFieldSpec, DataType, String)] =
        resolveToRelation(chain, a).map(_.name.toLowerCase)
          .flatMap(intervalBySrc.get)
      def litLong(l: Literal): Option[Long] = l.value match {
        case null => None
        case i: java.lang.Integer => Some(i.longValue)
        case lo: java.lang.Long => Some(lo.longValue)
        case _ => None
      }
      def asInterval(cj: Expression, child: LogicalPlan)
          : Option[IntervalCheck] = {
        def mk(a: AttributeReference, op: String, l: Literal)
            : Option[IntervalCheck] =
          intervalOf(child, a).flatMap { case (pf, dt, kind) =>
            if (a.dataType != dt) None
            else litLong(l).map(v => IntervalCheck(pf.name, dt, kind, op, v))
          }
        // `CAST(ts AS DATE) op DATE'…'` over an interval field: the cast
        // is per-file CONSTANT on day/hour transforms and monotone on
        // all, so the comparison decides in the epoch-day domain.
        // TimestampType casts go through the session zone — admitted
        // only when that zone is UTC; NTZ casts are zone-free.
        def mkCast(e: Expression, op: String, l: Literal)
            : Option[IntervalCheck] = e match {
          case Cast(a: AttributeReference, DateType, _, _)
              if a.dataType == TimestampNTZType ||
                 (a.dataType == TimestampType && sessionTzUtc) =>
            intervalOf(child, a).flatMap { case (pf, dt, kind) =>
              if (a.dataType != dt) None
              else l match {
                case Literal(d: java.lang.Integer, DateType) =>
                  Some(IntervalCheck(pf.name, dt, kind, op, d.longValue,
                    cast = true))
                case _ => None
              }
            }
          case _ => None
        }
        cj match {
          case IsNotNull(a: AttributeReference) =>
            intervalOf(child, a).map { case (pf, dt, kind) =>
              IntervalCheck(pf.name, dt, kind, "notnull", 0L) }
          // CAST(ts AS DATE) IS NOT NULL ⇔ ts IS NOT NULL
          case IsNotNull(Cast(a: AttributeReference, DateType, _, _)) =>
            intervalOf(child, a).map { case (pf, dt, kind) =>
              IntervalCheck(pf.name, dt, kind, "notnull", 0L) }
          case GreaterThanOrEqual(a: AttributeReference, l: Literal) => mk(a, ">=", l)
          case GreaterThanOrEqual(l: Literal, a: AttributeReference) => mk(a, "<=", l)
          case GreaterThan(a: AttributeReference, l: Literal) => mk(a, ">", l)
          case GreaterThan(l: Literal, a: AttributeReference) => mk(a, "<", l)
          case LessThan(a: AttributeReference, l: Literal) => mk(a, "<", l)
          case LessThan(l: Literal, a: AttributeReference) => mk(a, ">", l)
          case LessThanOrEqual(a: AttributeReference, l: Literal) => mk(a, "<=", l)
          case LessThanOrEqual(l: Literal, a: AttributeReference) => mk(a, ">=", l)
          case CEq(a: AttributeReference, l: Literal) => mk(a, "=", l)
          case CEq(l: Literal, a: AttributeReference) => mk(a, "=", l)
          case GreaterThanOrEqual(c: Cast, l: Literal) => mkCast(c, ">=", l)
          case GreaterThanOrEqual(l: Literal, c: Cast) => mkCast(c, "<=", l)
          case GreaterThan(c: Cast, l: Literal) => mkCast(c, ">", l)
          case GreaterThan(l: Literal, c: Cast) => mkCast(c, "<", l)
          case LessThan(c: Cast, l: Literal) => mkCast(c, "<", l)
          case LessThan(l: Literal, c: Cast) => mkCast(c, ">", l)
          case LessThanOrEqual(c: Cast, l: Literal) => mkCast(c, "<=", l)
          case LessThanOrEqual(l: Literal, c: Cast) => mkCast(c, ">=", l)
          case CEq(c: Cast, l: Literal) => mkCast(c, "=", l)
          case CEq(l: Literal, c: Cast) => mkCast(c, "=", l)
          case _ => None
        }
      }
      val exactConjs = Seq.newBuilder[(Expression, LogicalPlan)]
      val intervalChecks = Seq.newBuilder[IntervalCheck]
      filters.foreach { case (cond, child) =>
        if (!cond.deterministic) return None
        if (cond.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
          return None
        conjunctsOf(cond).foreach { cj =>
          val attrs = cj.collect { case a: AttributeReference => a }
          if (attrs.forall(a => identityOf(child, a).isDefined))
            exactConjs += ((cj, child))
          else asInterval(cj, child) match {
            case Some(ic) => intervalChecks += ic
            case None => return None
          }
        }
      }
      val exactFilters = exactConjs.result()
      val intervals = intervalChecks.result()

      // filter attributes of the exact conjuncts, at their own depth
      val filterSrcs = exactFilters.flatMap { case (cj, child) =>
        cj.collect { case a: AttributeReference =>
          identityOf(child, a).getOrElse(return None)
        }
      }

      // DISTINCT-count children: each must resolve (by lineage) to a
      // VALUE-EXACT partition source — the distinct count then equals
      // the number of distinct non-null stored tuple values over the
      // surviving entries — or (r18, VERDICT r17 #3) to a calendar
      // PERIOD of a partition source: the distinct count of
      // `CAST(ts AS DATE)` over a day(ts) transform is the count of
      // distinct rendered periods over surviving entries, exact when
      // every file's ordinal maps into one period ("active days"
      // dashboards). Anything else (bucket, data column) bails.
      // (a period child may already be pulled into a Project alias by
      // the time this rule sees it — periodAliasOf chases the exprId)
      def distinctPick(ch: Expression): Option[GroupVal] = ch match {
        case ar: AttributeReference =>
          identityOf(agg.child, ar).map(ExactVal(_): GroupVal)
            .orElse(periodAliasOf(agg.child, ar))
        case e => periodOf(agg.child, e)
      }
      val distinctVals: Seq[GroupVal] = agg.aggregateExpressions.flatMap {
        case Alias(ae: AggregateExpression, _) if ae.isDistinct =>
          ae.aggregateFunction match {
            case c: Count =>
              c.children.map(distinctPick(_).getOrElse(return None))
            case _ => return None
          }
        case _ => Seq.empty
      }
      val distinctSrcs: Seq[String] =
        distinctVals.collect { case ExactVal(s) => s }

      val usedSrcs: Seq[String] =
        (groupSrcs ++ filterSrcs ++ distinctSrcs).distinct
      // bare-agg shape (no exact fields, no interval checks, no
      // grouping, no distinct counts) is the global path's job
      if (usedSrcs.isEmpty && intervals.isEmpty && groupSpecs.isEmpty &&
          distinctVals.isEmpty)
        return None
      val srcIdx: Map[String, Int] = usedSrcs.zipWithIndex.toMap
      val usedFields = usedSrcs.map(s => idBySrc(s))

      // partition-evolution guard: every spec that names a used field
      // must define a VALUE-EXACT transform of the same source —
      // identity(date) and day(date) store the same epoch-day int, so
      // either is safe; interval fields need the SAME transform kind.
      // Anything else under the name poisons the entries' stored values
      // (entries from specs WITHOUT the field bail per-entry below).
      val specSafe = usedFields.forall { case (pf, dt) =>
        specsById.values.forall(_.filter(_.name == pf.name).forall(f =>
          valueExact(f, dt) && f.sourceId == pf.sourceId))
      } && (intervals.map(ic => (ic.fieldName, ic.kind)) ++
            (groupSpecs ++ distinctVals).collect {
              case PeriodVal(_, f, k, _, false) => (f, k) })
        .distinct.forall { case (fname, kind) =>
          val pf = t.partitionFields.map(_._1).find(_.name == fname)
            .getOrElse(return None)
          specsById.values.forall(_.filter(_.name == fname).forall(f =>
            f.sourceId == pf.sourceId &&
              f.transform.toLowerCase.stripSuffix("s") == kind))
        } && (groupSpecs ++ distinctVals).collect {
          case PeriodVal(src, f, _, _, true) => (src, f) }
        .distinct.forall { case (src, fname) =>
          // value-exact period source: every spec naming the field must
          // stay value-exact of the same source (like usedFields)
          val (pf, dt) = idBySrc.getOrElse(src, return None)
          specsById.values.forall(_.filter(_.name == fname).forall(f =>
            valueExact(f, dt) && f.sourceId == pf.sourceId))
        }
      if (!specSafe) return None

      // bind each EXACT conjunct against the used-field row layout
      val predicates: Seq[BasePredicate] = exactFilters.map { case (cj, child) =>
        var ok = true
        val bound = cj.transformUp {
          case a: AttributeReference =>
            identityOf(child, a).map(s =>
              BoundReference(srcIdx(s), a.dataType, nullable = true))
              .getOrElse { ok = false; a }
        }
        if (!ok) return None
        scala.util.Try(CPredicate.create(bound)).toOption.getOrElse(return None)
      }

      // the [lo, hiInc] SOURCE-value range of one stored ordinal
      def rangeOf(kind: String, dt: DataType, v: Int): (Long, Long) = {
        def monthStart(m: Int) = java.time.LocalDate.of(
          1970 + Math.floorDiv(m, 12), Math.floorMod(m, 12) + 1, 1)
        def span(start: java.time.LocalDate, end: java.time.LocalDate) =
          if (dt == DateType) (start.toEpochDay, end.toEpochDay - 1)
          else (start.toEpochDay * 86400000000L,
                end.toEpochDay * 86400000000L - 1)
        kind match {
          case "day"  => (v.toLong * 86400000000L,
                          (v + 1).toLong * 86400000000L - 1)
          case "hour" => (v.toLong * 3600000000L,
                          (v + 1).toLong * 3600000000L - 1)
          case "month" => span(monthStart(v), monthStart(v).plusMonths(1))
          case _       => span(java.time.LocalDate.of(1970 + v, 1, 1),
                               java.time.LocalDate.of(1971 + v, 1, 1))
        }
      }
      // Some(keep?) when the predicate is CONSTANT over the file's
      // range; None = the file straddles the literal → can't serve
      // exactly (the caller bails the whole rewrite)
      def decideInterval(ic: IntervalCheck, stored: Option[Any])
          : Option[Boolean] = stored match {
        // null ordinal = every row's source value is null → any
        // comparison is null-false, IS NOT NULL is false
        case None | Some(null) => Some(false)
        case Some(i: java.lang.Integer) =>
          if (ic.op == "notnull") return Some(true)
          val (lo, hi) =
            if (ic.cast) dayRangeOf(ic.kind, i.intValue)
            else rangeOf(ic.kind, ic.dt, i.intValue)
          ic.op match {
            case ">=" => if (lo >= ic.lit) Some(true)
                         else if (hi < ic.lit) Some(false) else None
            case ">"  => if (lo > ic.lit) Some(true)
                         else if (hi <= ic.lit) Some(false) else None
            case "<=" => if (hi <= ic.lit) Some(true)
                         else if (lo > ic.lit) Some(false) else None
            case "<"  => if (hi < ic.lit) Some(true)
                         else if (lo >= ic.lit) Some(false) else None
            // equality: outside the range is FALSE; a range collapsed
            // to one value (cast on day/hour) decides TRUE; a spanning
            // range (raw micros, cast on month/year) straddles
            case _    => if (ic.lit < lo || ic.lit > hi) Some(false)
                         else if (lo == hi && ic.lit == lo) Some(true)
                         else None
          }
        case _ => None // unexpected stored type — bail, don't guess
      }

      // Catalyst row of the used identity values for one tuple; None =
      // the tuple can't be evaluated (older spec, unconvertible value)
      def entryRow(e: graft.iceberg.TupleAgg): Option[InternalRow] = {
        val vs = usedFields.map { case (pf, dt) =>
          e.partition.get(pf.name) match {
            case None => return None
            case Some(v) => toCatalystVal(v, dt).getOrElse(return None)
          }
        }
        Some(new GenericInternalRow(vs.toArray))
      }

      // evaluate per tuple (zero-row files were dropped by the fold and
      // mint no groups). Exact conjuncts first — a tuple they exclude is
      // out regardless of any straddling interval conjunct (AND
      // semantics), so straddles only bail when the tuple would
      // otherwise survive.
      val evaluated: Seq[(graft.iceberg.TupleAgg, InternalRow)] =
        tuples0.map(e => e -> entryRow(e).getOrElse(return None))
      val matching = evaluated.filter { case (e, row) =>
        predicates.forall(_.eval(row)) && intervals.forall { ic =>
          // a field the entry doesn't carry (older spec) is
          // UNEVALUABLE, not excluded — bail the rewrite
          if (!e.partition.contains(ic.fieldName)) return None
          decideInterval(ic, e.partition.get(ic.fieldName))
            .getOrElse(return None)
        }
      }
      // TAINTED tuples (a live equality delete may still match their
      // files, r19 VERDICT r18 #1): servable only by EXCLUSION — every
      // tainted tuple must fall to the filters; one surviving taints
      // the whole answer (its partials are upper bounds) → normal plan.
      // A CDC-upserted partition thus keeps the scan-free counts on
      // every partition its deletes provably cannot touch.
      if (matching.exists(_._1.tainted)) return None

      // the grouping-key values of one tuple; None = unevaluable → bail
      def groupKey(e: graft.iceberg.TupleAgg,
                   row: InternalRow): Option[Seq[Any]] = {
        val vs = groupSpecs.map {
          case ExactVal(s) => row.get(srcIdx(s), idBySrc(s)._2)
          case PeriodVal(_, fname, srcKind, out, _) =>
            e.partition.get(fname) match {
              case None => return None // older spec — unevaluable
              case Some(null) => null  // null source → null period group
              case Some(v) =>
                periodValue(srcKind, out, v).getOrElse(return None)
            }
        }
        Some(vs)
      }

      // per-output serving over one group's (tuple, used-value row) pairs
      def outputsFor(pairs: Seq[(graft.iceberg.TupleAgg, InternalRow)],
                     key: Seq[Any]): Option[Seq[Any]] = {
        val es = pairs.map(_._1)
        val vs = agg.aggregateExpressions.map {
          case Alias(l: Literal, _) => l.value
          case Alias(ae: AggregateExpression, _) if ae.isDistinct =>
            // distinct tuples of value-exact sources and/or rendered
            // calendar periods (r18); SQL distinct excludes any tuple
            // with a null component; a period straddle bails (the
            // month-transform-asked-for-days fall-through)
            val picks: Seq[GroupVal] = ae.aggregateFunction match {
              case c: Count =>
                c.children.map(distinctPick(_).getOrElse(return None))
              case _ => return None
            }
            pairs.map { case (e, row) =>
              picks.map {
                case ExactVal(s) =>
                  val (i, dt) = (srcIdx(s), idBySrc(s)._2)
                  if (row.isNullAt(i)) null else row.get(i, dt)
                case PeriodVal(_, fname, srcKind, out, _) =>
                  e.partition.get(fname) match {
                    case None => return None // older spec — unevaluable
                    case Some(null) => null  // all-null source: excluded
                    case Some(v) =>
                      periodValue(srcKind, out, v).getOrElse(return None)
                  }
              }
            }.filter(_.forall(_ != null)).distinct.size.toLong
          case Alias(ae: AggregateExpression, _) =>
            ae.aggregateFunction match {
              case c: Count => c.children match {
                case Seq(ar: AttributeReference) =>
                  fieldIdOf(agg.child, ar, cols)
                    .flatMap(id => nonNullFold(es, id))
                    .getOrElse(return None)
                case _ => es.map(_.rows).sum
              }
              case m: Min =>
                val a = m.child.asInstanceOf[AttributeReference]
                fieldIdOf(agg.child, a, cols)
                  .flatMap(id => boundFold(es, id, lower = true))
                  .getOrElse(return None).orNull
              case m: Max =>
                val a = m.child.asInstanceOf[AttributeReference]
                fieldIdOf(agg.child, a, cols)
                  .flatMap(id => boundFold(es, id, lower = false))
                  .getOrElse(return None).orNull
              case _ => return None
            }
          case a: AttributeReference =>
            val i = groupExprs.indexWhere(_.semanticEquals(a))
            if (i < 0) return None
            key(i)
          case Alias(inner, _) =>
            val i = groupExprs.indexWhere(_.semanticEquals(inner))
            if (i < 0) return None
            key(i)
          case _ => return None
        }
        Some(vs)
      }

      val outAttrs = agg.aggregateExpressions.map(_.toAttribute)
      if (agg.groupingExpressions.isEmpty) {
        // filtered global: exactly one row (count 0 / NULL bounds when
        // nothing matches)
        outputsFor(matching, Seq.empty).map { vs =>
          Project(agg.aggregateExpressions.zip(vs).map { case (e, v) =>
            val a = e.asInstanceOf[Alias]
            Alias(Literal(v, a.dataType), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          }, OneRowRelation())
        }
      } else {
        // grouped: one row per distinct per-file-constant grouping key
        // that survived the filters
        val grouped = matching.groupBy { case (e, row) =>
          groupKey(e, row).getOrElse(return None)
        }
        val rows = grouped.toSeq.map { case (key, pairs) =>
          outputsFor(pairs, key).getOrElse(return None)
        }
        Some(LocalRelation(
          outAttrs, rows.map(vs => InternalRow.fromSeq(vs))))
      }
    }
  }

  /** Manifest Avro-domain identity partition value → Catalyst value of
    * the source column's type. None = unconvertible (fall through). */
  private def toCatalystVal(v: Any, dt: DataType): Option[Any] = (v, dt) match {
    case (null, _) => Some(null)
    case (i: java.lang.Integer, IntegerType | DateType) => Some(i.intValue)
    case (i: java.lang.Integer, LongType) => Some(i.longValue)
    case (l: java.lang.Long, LongType | TimestampType | TimestampNTZType) =>
      Some(l.longValue)
    case (s: String, StringType) =>
      Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
    case (b: java.lang.Boolean, BooleanType) => Some(b.booleanValue)
    case _ => None
  }

  /** The keyed-scan claim this plan justifies for relation `r`, or None
    * (splice native). */
  private def keyedMode(
      plan: LogicalPlan, r: DataSourceV2Relation, t: GraftTable)
      : Option[String] = {
    val srcCols: Set[String] = t.partitionFields.map(_._2.toLowerCase).toSet
    val sortCols: Set[String] = t.sortColumns.map(_.toLowerCase).toSet
    if (srcCols.isEmpty && sortCols.isEmpty) return None
    val rOut = r.outputSet
    def normT(s: String) = s.toLowerCase.replaceAll("\\s", "")
    var kgp = false
    var splits = false
    def conj(e: Expression): Seq[Expression] = e match {
      case And(l, rr) => conj(l) ++ conj(rr)
      case other => Seq(other)
    }
    // relations reachable through unary pass-through nodes only — an
    // intermediate join or aggregate re-shuffles its child, destroying
    // the scan-level grouping before the consumer sees it
    def directRelations(p: LogicalPlan): Seq[DataSourceV2Relation] =
      p match {
        case r2: DataSourceV2Relation => Seq(r2)
        case SubqueryAlias(_, child) => directRelations(child)
        case Project(_, child) => directRelations(child)
        case Filter(_, child) => directRelations(child)
        case h: ResolvedHint => directRelations(h.child)
        case _ => Seq.empty
      }
    plan.foreach {
      case agg: Aggregate =>
        // group-by on (a superset of) the partition sources: the keyed
        // grouping satisfies the aggregation's clustered distribution —
        // but only when the relation feeds the Aggregate DIRECTLY. An
        // intermediate join on non-partition keys re-shuffles anyway, so
        // a kgp claim there would collapse the scan's parallelism while
        // saving no exchange.
        val grouped = agg.groupingExpressions.collect {
          case a: AttributeReference if rOut.contains(a) => a.name.toLowerCase
        }.toSet
        if (srcCols.nonEmpty && srcCols.subsetOf(grouped) &&
            directRelations(agg.child).exists(_ eq r)) kgp = true
      case j: Join if j.condition.isDefined =>
        val pairs = conj(j.condition.get).collect {
          case EqualTo(a: AttributeReference, b: AttributeReference) => (a, b)
        }
        // (my attr, counterpart attr) for conjuncts touching this relation
        val mine = pairs.flatMap { case (a, b) =>
          if (rOut.contains(a)) Some((a, b))
          else if (rOut.contains(b)) Some((b, a)) else None
        }
        val myKeys = mine.map(_._1.name.toLowerCase).toSet
        if ((myKeys intersect srcCols).nonEmpty) {
          val counterpart: Map[String, Seq[AttributeReference]] =
            mine.groupBy(_._1.name.toLowerCase)
              .view.mapValues(_.map(_._2)).toMap
          // SPJ-able: every partition source is a join key, and the
          // OPPOSITE join side's DIRECT relation is a graft table whose
          // spec aligns positionally (same transforms, sources connected
          // by the equi-pairs) and which can itself plan keyed
          val rInLeft = mine.exists { case (a, _) => j.left.outputSet.contains(a) }
          val otherSide = if (rInLeft) j.right else j.left
          // the SAME directness applies to r's own side: a relation
          // buried under an intermediate join gets re-shuffled before
          // this join, so its scan-level grouping buys nothing here
          val rIsDirect =
            directRelations(if (rInLeft) j.left else j.right).exists(_ eq r)
          def aligned: Boolean = rIsDirect && directRelations(otherSide).exists {
            case r2 if (r2 ne r) && r2.table.isInstanceOf[GraftTable] =>
              val t2 = r2.table.asInstanceOf[GraftTable]
              t2.partitionFields.length == t.partitionFields.length &&
                t.partitionFields.zip(t2.partitionFields).forall {
                  case ((pf1, s1), (pf2, s2)) =>
                    normT(pf1.transform) == normT(pf2.transform) &&
                      counterpart.getOrElse(s1.toLowerCase, Seq.empty)
                        .exists(attr => r2.outputSet.contains(attr) &&
                          attr.name.equalsIgnoreCase(s2))
                } && t2.keyedPlan(spark).isDefined
            case _ => false
          }
          if (srcCols.nonEmpty && srcCols.subsetOf(myKeys) && aligned) kgp = true
          else splits = true
        } else if ((myKeys intersect sortCols).nonEmpty) {
          // equi-join on a SORTED (clustered-layout) data column: the
          // keyed scan exposes it for runtime filtering, so a dim-side
          // IN-set prunes files by their column bounds — the same
          // star-join win as partition-source joins, one level down
          splits = true
        }
      case f: Filter =>
        val names = f.condition.references.toSeq.collect {
          case a: AttributeReference if rOut.contains(a) => a.name.toLowerCase
        }
        // filters on partition sources prune by tuple; filters on SORTED
        // columns prune whole files by bounds — both only on the keyed
        // path (the native relation's parquet pushdown skips row groups,
        // not files)
        if ((names.toSet intersect (srcCols ++ sortCols)).nonEmpty)
          splits = true
      case _ => ()
    }
    if (kgp) Some(GraftKeyedScan.ModeKgp)
    else if (splits) Some(GraftKeyedScan.ModeSplits)
    else None
  }

  private def withMode(
      opts: CaseInsensitiveStringMap, mode: String): CaseInsensitiveStringMap = {
    val m = new java.util.HashMap[String, String](opts.asCaseSensitiveMap())
    m.put(GraftKeyedScan.ModeOption, mode)
    new CaseInsensitiveStringMap(m)
  }
}
