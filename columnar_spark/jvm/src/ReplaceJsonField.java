import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Expression;
import scala.runtime.AbstractPartialFunction;

/** Rewrites every `get_json_object(parent, '<path>')` occurrence (same
 * parent exprId + same literal path) to a replacement attribute — the
 * virtual column the per-field index is keyed by. After the transform,
 * any LEFTOVER reference to the parent attribute means the condition
 * used the parent some other way (a bare reference or a different
 * path) and the caller must bail. */
public class ReplaceJsonField extends AbstractPartialFunction<Expression, Expression> {
    private final JsonFieldRef target;
    private final AttributeReference replacement;

    public ReplaceJsonField(JsonFieldRef target, AttributeReference replacement) {
        this.target = target;
        this.replacement = replacement;
    }

    @Override
    public boolean isDefinedAt(Expression e) {
        JsonFieldRef r = JsonFieldRef.of(e);
        return r != null
                && r.parent.exprId().equals(target.parent.exprId())
                && r.path.equals(target.path);
    }

    @Override
    public Expression apply(Expression e) {
        return replacement;
    }
}
