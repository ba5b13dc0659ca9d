import org.apache.spark.sql.catalyst.plans.logical.Aggregate;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import scala.runtime.AbstractPartialFunction;

/** Plan-tree transform: replaces every eligible Aggregate SUBTREE with
 * its sidecar-served form. A query's aggregate is rarely the plan root
 * in production — it sits under a write command (INSERT / noop sink), a
 * LIMIT, or a join input — and the substitution is position-independent
 * because Aggregate(Filter(Relation)) is self-contained. Parents keep
 * resolving because CountRewriteRule.pinOutput re-aliases the new
 * subtree's output onto the ORIGINAL attributes' exprIds (and bails on
 * any type mismatch). */
public class RewriteAggSubtree extends AbstractPartialFunction<LogicalPlan, LogicalPlan> {
    private final CountRewriteRule rule;

    public RewriteAggSubtree(CountRewriteRule rule) {
        this.rule = rule;
    }

    @Override
    public boolean isDefinedAt(LogicalPlan p) {
        return p instanceof Aggregate;
    }

    @Override
    public LogicalPlan apply(LogicalPlan p) {
        try {
            Aggregate agg = (Aggregate) p;
            LogicalPlan rewritten = rule.rewriteAggregate(agg);
            if (rewritten == null) return p;
            LogicalPlan pinned = rule.pinOutput(agg, rewritten);
            return pinned == null ? p : pinned;
        } catch (Throwable t) {
            if (System.getenv("CSE_DEBUG") != null) t.printStackTrace();
            return p; // conservative: never fail a query over a rewrite
        }
    }
}
