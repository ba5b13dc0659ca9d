import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Expression;
import scala.runtime.AbstractPartialFunction;

/** Rewrites the one referenced attribute to its unqualified form so the
 * rendered SQL resolves against the index frame (same exprId — only the
 * qualifier is dropped; rendering handles quoting/escaping). */
public class StripQualifier extends AbstractPartialFunction<Expression, Expression> {
    private final Attribute target;

    public StripQualifier(Attribute target) {
        this.target = target;
    }

    @Override
    public boolean isDefinedAt(Expression e) {
        return e instanceof AttributeReference
                && ((AttributeReference) e).exprId().equals(target.exprId());
    }

    @Override
    public Expression apply(Expression e) {
        return ((AttributeReference) e)
                .withQualifier(scala.collection.immutable.Seq$.MODULE$.<String>empty());
    }
}
