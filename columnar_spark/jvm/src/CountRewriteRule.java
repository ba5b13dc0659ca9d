import java.io.File;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.AttributeSet;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression;
import org.apache.spark.sql.catalyst.expressions.aggregate.Count;
import org.apache.spark.sql.catalyst.plans.logical.Aggregate;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.execution.datasources.HadoopFsRelation;
import org.apache.spark.sql.execution.datasources.LogicalRelation;
import org.apache.spark.sql.functions;

/**
 * Index-covered COUNT(*) rewrite as a real Catalyst optimizer rule.
 *
 * Matches the root plan shape
 *     Aggregate[count(1) AS name](
 *         [Project]* Filter(cond) [Project]* LogicalRelation(parquet))
 * where cond is deterministic and references exactly ONE column that has
 * a persisted value->count sidecar at `<table>.parquet.vidx/<col>`
 * (stats.write_value_index's artifact, maintained on append / rebuilt on
 * MERGE), and replaces it with
 *     Aggregate[coalesce(sum(cnt),0) cast bigint AS name](
 *         Filter(cond') Scan(<vidx dir>))
 * — the few-KB index relation; the base-table scan disappears from the
 * plan. Exactness: the sidecar materializes every (value, count) pair
 * including NULL; an inclusive predicate over NULL evaluates to null and
 * filters out, identical to WHERE semantics on the base table.
 *
 * Deliberately conservative: any shape it cannot PROVE eligible is left
 * untouched (the rewrite is an optimization, never a semantics change),
 * and any internal error falls through to the original plan. JSON
 * virtual-field sidecars (which have a _meta.json parent linkage but no
 * physical column) are covered through the same naming convention when
 * the query filters on the materialized virtual column.
 */
public class CountRewriteRule extends Rule<LogicalPlan> {
    private final SparkSession session;

    public CountRewriteRule(SparkSession session) {
        this.session = session;
    }

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        try {
            LogicalPlan rewritten = rewrite(plan);
            return rewritten != null ? rewritten : plan;
        } catch (Throwable t) {
            return plan; // conservative: never fail a query over a rewrite
        }
    }

    private LogicalPlan rewrite(LogicalPlan plan) {
        if (!(plan instanceof Aggregate)) return null;
        Aggregate agg = (Aggregate) plan;
        if (agg.groupingExpressions().isEmpty()) return rewriteGlobalCount(agg);
        return rewriteGroupCount(agg);
    }

    /** SELECT COUNT(*) FROM t WHERE <single-col pred>  ->  sum(cnt) off
     * the .vidx sidecar. */
    private LogicalPlan rewriteGlobalCount(Aggregate agg) {
        if (agg.aggregateExpressions().size() != 1) return null;
        Alias alias = countStarAlias(agg.aggregateExpressions().head());
        if (alias == null) return null;

        LogicalPlan child = skipAttributeOnlyProjects(agg.child());
        if (!(child instanceof Filter)) return null;
        Filter filter = (Filter) child;
        Expression cond = filter.condition();

        Attribute attr = singleColumnRef(cond);
        if (attr == null) return null;
        String tablePath = relationPath(skipAttributeOnlyProjects(filter.child()));
        if (tablePath == null) return null;
        Dataset<Row> idx = loadIndex(tablePath, attr);
        if (idx == null) return null;

        Dataset<Row> result =
                idx.filter(renderUnqualified(cond, attr))
                        .agg(
                                functions.coalesce(functions.sum("cnt"), functions.lit(0L))
                                        .cast("long")
                                        .alias(alias.name()));
        return result.queryExecution().analyzed();
    }

    /** SELECT col, COUNT(*) FROM t [WHERE <pred on col>] GROUP BY col
     * -> the (value, cnt) sidecar IS the result relation. The index
     * materializes every group including NULL, and an inclusive WHERE
     * never matches NULL — identical to base-table GROUP BY. */
    private LogicalPlan rewriteGroupCount(Aggregate agg) {
        if (agg.groupingExpressions().size() != 1) return null;
        if (!(agg.groupingExpressions().head() instanceof AttributeReference)) {
            return null;
        }
        AttributeReference gcol =
                (AttributeReference) agg.groupingExpressions().head();
        if (agg.aggregateExpressions().size() != 2) return null;
        NamedExpression first = agg.aggregateExpressions().head();
        // first output: the grouping attribute itself (possibly aliased)
        String outName;
        if (first instanceof AttributeReference
                && ((AttributeReference) first).exprId().equals(gcol.exprId())) {
            outName = first.name();
        } else if (first instanceof Alias
                && ((Alias) first).child() instanceof AttributeReference
                && ((AttributeReference) ((Alias) first).child())
                        .exprId()
                        .equals(gcol.exprId())) {
            outName = ((Alias) first).name();
        } else {
            return null;
        }
        Alias cntAlias = countStarAlias(agg.aggregateExpressions().apply(1));
        if (cntAlias == null) return null;

        LogicalPlan child = skipAttributeOnlyProjects(agg.child());
        Expression cond = null;
        if (child instanceof Filter) {
            cond = ((Filter) child).condition();
            Attribute ref = singleColumnRef(cond);
            if (ref == null || !ref.exprId().equals(gcol.exprId())) return null;
            child = skipAttributeOnlyProjects(((Filter) child).child());
        }
        String tablePath = relationPath(child);
        if (tablePath == null) return null;
        Dataset<Row> idx = loadIndex(tablePath, gcol);
        if (idx == null) return null;

        if (cond != null) {
            idx = idx.filter(renderUnqualified(cond, gcol));
        }
        Dataset<Row> result =
                idx.select(
                        functions.col(gcol.name()).alias(outName),
                        functions.coalesce(functions.col("cnt"), functions.lit(0L))
                                .cast("long")
                                .alias(cntAlias.name()));
        return result.queryExecution().analyzed();
    }

    // ------------------------------------------------------------ helpers

    /** Alias over a plain COUNT(1)/COUNT(*) aggregate, else null. */
    private Alias countStarAlias(NamedExpression ne) {
        if (!(ne instanceof Alias)) return null;
        Alias alias = (Alias) ne;
        if (!(alias.child() instanceof AggregateExpression)) return null;
        AggregateExpression ae = (AggregateExpression) alias.child();
        if (ae.isDistinct() || ae.filter().isDefined()) return null;
        if (!(ae.aggregateFunction() instanceof Count)) return null;
        Count cnt = (Count) ae.aggregateFunction();
        if (cnt.children().size() != 1) return null;
        if (!(cnt.children().head() instanceof Literal)) return null;
        return alias;
    }

    /** The single attribute a deterministic, subquery-free condition
     * references, else null. */
    private Attribute singleColumnRef(Expression cond) {
        if (!cond.deterministic() || hasSubquery(cond)) return null;
        AttributeSet refs = cond.references();
        if (refs.size() != 1) return null;
        return (Attribute) refs.iterator().next();
    }

    /** Single local root path of a parquet LogicalRelation, else null. */
    private String relationPath(LogicalPlan rel) {
        if (!(rel instanceof LogicalRelation)) return null;
        LogicalRelation lr = (LogicalRelation) rel;
        if (!(lr.relation() instanceof HadoopFsRelation)) return null;
        HadoopFsRelation fs = (HadoopFsRelation) lr.relation();
        if (fs.location().rootPaths().size() != 1) return null;
        String tablePath = fs.location().rootPaths().head().toUri().getPath();
        if (tablePath.contains(".vidx")) return null; // never fire on an index
        return tablePath;
    }

    /** The .vidx sidecar for (table, column) with `value` renamed to the
     * column name, or null when none exists. */
    private Dataset<Row> loadIndex(String tablePath, Attribute attr) {
        File idxDir = new File(tablePath + ".vidx/" + attr.name());
        if (!idxDir.isDirectory()) return null;
        return session.read().parquet(idxDir.getPath())
                .withColumnRenamed("value", attr.name());
    }

    /** Render the condition with the attribute's qualifier stripped (a
     * view alias like `li`.`col` would not resolve against the index
     * frame). Rendering — not string surgery — keeps literals intact. */
    private String renderUnqualified(Expression cond, Attribute attr) {
        Expression unqualified =
                (Expression) cond.transformUp(new StripQualifier(attr));
        return unqualified.sql();
    }

    /** Skip Project nodes that only pass attributes through (column
     * pruning); bail (return the node itself) on computing projects. */
    private LogicalPlan skipAttributeOnlyProjects(LogicalPlan p) {
        while (p instanceof Project) {
            Project proj = (Project) p;
            boolean attrsOnly = true;
            scala.collection.Iterator<NamedExpression> it = proj.projectList().iterator();
            while (it.hasNext()) {
                if (!(it.next() instanceof Attribute)) {
                    attrsOnly = false;
                    break;
                }
            }
            if (!attrsOnly) return p;
            p = proj.child();
        }
        return p;
    }

    private boolean hasSubquery(Expression e) {
        if (e instanceof org.apache.spark.sql.catalyst.expressions.SubqueryExpression) {
            return true;
        }
        scala.collection.Iterator<Expression> it = e.children().iterator();
        while (it.hasNext()) {
            if (hasSubquery(it.next())) return true;
        }
        return false;
    }
}
