import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GetJsonObject;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.unsafe.types.UTF8String;

/** Recognition + virtual-naming of `get_json_object(col, '$.path')`
 * expressions — the JSON per-field index convention shared with the
 * Python side (stats.json_virtual_name: 'props' + '$.k' ->
 * 'props__j_k'). */
public final class JsonFieldRef {
    public final AttributeReference parent;
    public final String path;

    private JsonFieldRef(AttributeReference parent, String path) {
        this.parent = parent;
        this.path = path;
    }

    /** Match GetJsonObject(AttributeReference, string literal starting
     * with '$'), else null. */
    public static JsonFieldRef of(Expression e) {
        if (!(e instanceof GetJsonObject)) return null;
        GetJsonObject g = (GetJsonObject) e;
        if (!(g.json() instanceof AttributeReference)) return null;
        if (!(g.path() instanceof Literal)) return null;
        Object v = ((Literal) g.path()).value();
        if (!(v instanceof UTF8String)) return null;
        String path = v.toString();
        if (!path.startsWith("$")) return null;
        return new JsonFieldRef((AttributeReference) g.json(), path);
    }

    /** Python twin: stats.json_virtual_name. */
    public String virtualName() {
        String frag = path.replaceFirst("^\\$", "");
        frag = frag.replaceAll("^\\.+", "").replaceAll("\\.+$", "");
        frag = frag.replaceAll("[^A-Za-z0-9]+", "_");
        frag = frag.replaceAll("^_+", "").replaceAll("_+$", "");
        if (frag.isEmpty()) return null;
        return parent.name() + "__j_" + frag;
    }
}
