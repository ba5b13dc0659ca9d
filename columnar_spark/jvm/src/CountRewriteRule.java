import java.io.File;

import org.apache.spark.sql.Dataset;
import org.apache.spark.sql.Row;
import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.Attribute;
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
        if (!agg.groupingExpressions().isEmpty()) return null;
        if (agg.aggregateExpressions().size() != 1) return null;
        NamedExpression ne = agg.aggregateExpressions().head();
        if (!(ne instanceof Alias)) return null;
        Alias alias = (Alias) ne;
        if (!(alias.child() instanceof AggregateExpression)) return null;
        AggregateExpression ae = (AggregateExpression) alias.child();
        if (ae.isDistinct() || ae.filter().isDefined()) return null;
        if (!(ae.aggregateFunction() instanceof Count)) return null;
        Count cnt = (Count) ae.aggregateFunction();
        if (cnt.children().size() != 1) return null;
        if (!(cnt.children().head() instanceof Literal)) return null; // count(1) == COUNT(*)

        LogicalPlan child = skipAttributeOnlyProjects(agg.child());
        if (!(child instanceof Filter)) return null;
        Filter filter = (Filter) child;
        Expression cond = filter.condition();
        if (!cond.deterministic()) return null;
        if (hasSubquery(cond)) return null;

        LogicalPlan rel = skipAttributeOnlyProjects(filter.child());
        if (!(rel instanceof LogicalRelation)) return null;
        LogicalRelation lr = (LogicalRelation) rel;
        if (!(lr.relation() instanceof HadoopFsRelation)) return null;
        HadoopFsRelation fs = (HadoopFsRelation) lr.relation();
        if (fs.location().rootPaths().size() != 1) return null;
        String tablePath = fs.location().rootPaths().head().toUri().getPath();
        if (tablePath.contains(".vidx")) return null; // never fire on an index

        AttributeSet refs = cond.references();
        if (refs.size() != 1) return null;
        Attribute attr = (Attribute) refs.iterator().next();
        String col = attr.name();

        File idxDir = new File(tablePath + ".vidx/" + col);
        if (!idxDir.isDirectory()) return null;

        // Rebind the condition over the index via its SQL form: strip
        // the attribute's qualifier (a view/table alias like `li`.`col`
        // would not resolve against the index frame) and render — the
        // single unqualified quoted name then resolves against the
        // renamed `value` column. Rendering (not string surgery) keeps
        // literals intact.
        Expression unqualified =
                (Expression) cond.transformUp(new StripQualifier(attr));
        String condSql = unqualified.sql();
        Dataset<Row> idx =
                session.read().parquet(idxDir.getPath()).withColumnRenamed("value", col);
        Dataset<Row> result =
                idx.filter(condSql)
                        .agg(
                                functions.coalesce(functions.sum("cnt"), functions.lit(0L))
                                        .cast("long")
                                        .alias(alias.name()));
        return result.queryExecution().analyzed();
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
