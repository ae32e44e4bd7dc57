package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Expression, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LeafNode, LogicalPlan, SubqueryAlias, Union}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extracted from the ANALYZED logical plan — the
  * governance surface (impact analysis, PII propagation, audit) that a
  * catalog derives for every published dataset: for each output column,
  * which (input, column) leaves it was computed from.
  *
  * Pure plan metadata — no data is read and nothing executes; cost is
  * O(plan size) on the driver. Lineage is tracked through Catalyst
  * `ExprId`s: aliases map to the union of their children's sources
  * (covering Project/Aggregate/Window in one rule), generators fan the
  * generator's sources out to every generated column, and Union merges
  * sources positionally across branches. Filters, joins, sorts and
  * limits are pass-through. A column with no leaf sources (a literal,
  * a count(*)) reports a single (null, null) row — absence of lineage
  * is itself the auditable fact.
  *
  * Two boundary flavors share one walker:
  *  - [[columnLineage]]: inputs are DataFrame OBJECTS (`inputs` must be
  *    the same objects the query was built from — their leaf `ExprId`s
  *    are what the composed plan carries);
  *  - [[columnLineageSql]]: inputs are VIEW NAMES — the boundary is the
  *    `SubqueryAlias` the analyzer wraps around each resolved view, so
  *    lineage works for `spark.sql(text)` plans where no DataFrame
  *    object exists to anchor on.
  */
object Lineage {

  private type Src = Set[(String, String)]

  def columnLineage(df: DataFrame, inputs: Map[String, DataFrame]): DataFrame = {
    val leafIds: Map[ExprId, (String, String)] = inputs.flatMap {
      case (nm, in) =>
        in.queryExecution.analyzed.output.map(a => a.exprId -> (nm, a.name))
    }
    emit(df, walkAndResolve(df.queryExecution.analyzed, leafIds, Set.empty))
  }

  /** Lineage for a `spark.sql`-built frame: `views` are the registered
    * temp-view names the query reads; each view's `SubqueryAlias` node
    * is the boundary (its own internals — however the view was built —
    * stay opaque, exactly like a catalog table would).
    */
  def columnLineageSql(df: DataFrame, views: Set[String]): DataFrame =
    emit(df, walkAndResolve(df.queryExecution.analyzed, Map.empty, views))

  /** Lineage anchored on LAKE PATHS — the catalog's production shape:
    * `lakes` maps a table label to its TxLake root; any file-scan leaf
    * whose every input file sits under a registered root resolves to that
    * label (longest root wins, so nested lakes stay distinct). This is
    * how lineage covers `TxLake.readSnapshot` frames, where there is no
    * DataFrame object or view name to anchor on — the physical layout IS
    * the identity. Composes with the view boundary: both can be active
    * in one walk.
    */
  def columnLineageLake(
      df: DataFrame,
      lakes: Map[String, String],
      views: Set[String] = Set.empty): DataFrame =
    emit(df, walkAndResolve(df.queryExecution.analyzed, Map.empty, views,
      lakes.map { case (label, root) =>
        label -> new org.apache.hadoop.fs.Path(root).toUri.getPath
      }))

  private def walkAndResolve(
      plan: LogicalPlan,
      leafIds: Map[ExprId, (String, String)],
      views: Set[String],
      lakeRoots: Map[String, String] = Map.empty)
      : Seq[(String, String, String)] = {
    // label of the registered lake that contains EVERY file this relation
    // scans (longest matching root wins)
    def lakeLabel(lr: LogicalRelation): Option[String] =
      lr.relation match {
        case h: HadoopFsRelation =>
          val files = h.location.rootPaths.map(_.toUri.getPath)
          lakeRoots.toSeq
            .filter { case (_, root) =>
              files.nonEmpty &&
                files.forall(f => f == root || f.startsWith(root + "/"))
            }
            .sortBy { case (_, root) => -root.length }
            .headOption.map(_._1)
        case _ => None
      }
    // a declared-input column ENDS the walk: its own alias chain (toDF,
    // selects inside the input) must not dissolve the boundary
    def boundary(id: ExprId): Option[Src] = leafIds.get(id).map(Set(_))
    def go(p: LogicalPlan): Map[ExprId, Src] = {
      val cm = p.children.map(go)
        .foldLeft(Map.empty[ExprId, Src])(_ ++ _)
      // bottom-up map first (it is built boundary-respecting; Union may
      // have MERGED several inputs under one reused ExprId), declared
      // boundary as the fallback for ids no subtree produced
      def lookup(id: ExprId): Src =
        cm.get(id).orElse(boundary(id)).getOrElse(Set.empty)
      def src(e: Expression): Src =
        e.references.toSeq.flatMap(a => lookup(a.exprId)).toSet
      val aliased: Map[ExprId, Src] = p.expressions.flatMap(_.collect {
        case al: Alias => al.exprId -> boundary(al.exprId).getOrElse(src(al.child))
      }).toMap
      val shaped: Map[ExprId, Src] = p match {
        case sa: SubqueryAlias if views.contains(sa.alias) =>
          // named-view boundary: everything beneath is the view's
          // business; its output columns ARE the lineage leaves
          sa.output.map(a => a.exprId -> (Set((sa.alias, a.name)): Src)).toMap
        case lr: LogicalRelation if lakeLabel(lr).isDefined =>
          val label = lakeLabel(lr).get
          lr.output.map(a => a.exprId -> (Set((label, a.name)): Src)).toMap
        case l: LeafNode =>
          l.output.map(a =>
            a.exprId -> boundary(a.exprId).getOrElse(Set.empty: Src)).toMap
        case u: Union =>
          u.output.zipWithIndex.map { case (a, i) =>
            a.exprId -> u.children
              .flatMap(c => cm.get(c.output(i).exprId).orElse(
                boundary(c.output(i).exprId)).getOrElse(Set.empty: Src))
              .toSet
          }.toMap
        case g: Generate =>
          g.generatorOutput.map(o => o.exprId -> src(g.generator)).toMap
        case _ => Map.empty
      }
      cm ++ aliased ++ shaped
    }
    val m = go(plan)
    plan.output.flatMap { a =>
      val srcs = m.get(a.exprId).filter(_.nonEmpty)
        .orElse(boundary(a.exprId))
        .getOrElse(Set.empty[(String, String)])
      if (srcs.isEmpty) Seq((a.name, null, null))
      else srcs.toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }
  }

  private def emit(
      df: DataFrame, rows: Seq[(String, String, String)]): DataFrame =
    df.sparkSession.createDataFrame(rows)
      .toDF("out_col", "src_table", "src_col")
}
