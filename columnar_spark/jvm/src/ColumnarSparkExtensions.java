/**
 * Catalyst extension entry point — the production placement of the
 * engine's index-covered COUNT rewrite (reference CalcCount,
 * secondary/secondary.cpp:531-551, which the host wires in
 * unconditionally). Injected via
 *   spark.sql.extensions=ColumnarSparkExtensions
 *   spark.jars=<path>/columnar-spark-ext.jar
 * so PLAIN spark.sql / DataFrame count queries get the rewrite — not
 * only the Engine.sql facade (columnar_spark/plans/count_rewrite.py,
 * which remains the richer Python-side surface: GROUP BY, DISTINCT,
 * MV routing, JSON fields).
 *
 * Written in Java (not Scala) because the build environment ships javac
 * but no offline Scala toolchain; compiled against the pyspark-bundled
 * jars by tools/build_jvm_ext.sh.
 */

import org.apache.spark.sql.SparkSessionExtensions;
import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

public class ColumnarSparkExtensions
        extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {
    @Override
    public BoxedUnit apply(SparkSessionExtensions ext) {
        ext.injectOptimizerRule(new CountRewriteRuleBuilder());
        return BoxedUnit.UNIT;
    }
}
