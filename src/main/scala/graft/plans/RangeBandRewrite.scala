package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: rewrites a point-in-interval theta join
  *
  * {{{ points JOIN intervals ON ts >= lo AND ts <= hi }}}
  *
  * — which Spark can only plan as a nested-loop join (no equi keys) —
  * into a banded equi-join: the point side gets `band = floor(ts/W)`,
  * the interval side explodes one row per band its `[lo, hi]` covers,
  * and the join becomes `band = band AND <original condition>`. With an
  * equi key the planner picks hash/sort-merge join, turning the O(|P|·|I|)
  * nested loop into O(|P| + Σ bands(I)) — the rewrite q105/q22 apply by
  * hand, done for ANY such join in the session (SURVEY §7.3's
  * custom-`Rule[LogicalPlan]` case; same trick as Databricks' range-join
  * binning).
  *
  * Every matched pair appears exactly once (a point has exactly one band;
  * the interval's exploded bands are distinct), and NULL endpoints drop
  * the row on both the original (three-valued predicate) and rewritten
  * (empty/NULL `sequence`) plans, so results are identical.
  *
  * Off by default. Enable with the band width (seconds for timestamps,
  * raw units for longs — pick ≈ the typical interval length). The band
  * width is the operator knob AND the safety bound: each interval
  * explodes to (hi−lo)/W + 1 rows, so a sentinel-bounded "open" interval
  * (hi = year 9999) at a small W materializes a huge sequence — cap or
  * split open intervals BEFORE the join, exactly as with the hand-banded
  * q105 form. Inverted intervals (hi < lo) are guarded (match nothing,
  * like the nested loop):
  *
  * {{{
  * spark.conf.set("spark.graft.rangeJoin.bandSeconds", 86400)
  * RangeBandRewrite.install(spark)   // or via GraftExtensions
  * }}}
  */
object RangeBandRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rangeJoin.bandSeconds"

  /** Append to an existing session's optimizer (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(ConfKey, "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      // Project back to the join's own output: the rewritten join also
      // carries the two band columns, which must not leak into the
      // caller-visible schema when the join is the plan root
      case j: Join => rewrite(j, w).map(nj => Project(j.output, nj)).getOrElse(j)
    }
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  /** floor-divide a timestamp (→ whole seconds, Cast floors) or raw long
    * into its band index. */
  private def band(e: Expression, w: Long): Expression = e.dataType match {
    // timestamp → epoch seconds (Cast floors); timezone supplied so the
    // Cast node is resolved inside the optimizer
    case TimestampType =>
      IntegralDivide(Cast(e, LongType, Some(conf.sessionLocalTimeZone)), Literal(w))
    case LongType      => IntegralDivide(e, Literal(w))
    case _             => throw new IllegalStateException("unreachable: guarded by bandable()")
  }

  private def bandable(e: Expression): Boolean = e.dataType match {
    case TimestampType | LongType => true
    case _                        => false
  }

  private def rewrite(j: Join, w: Long): Option[Join] = j match {
    case Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      // only pure theta joins: an existing cross-side equality conjunct
      // means the planner already has an equi key (and guards this rule
      // against re-matching its own output in the fixed-point batch)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) =>
          (refsOnly(a, left) && refsOnly(b, right)) ||
          (refsOnly(a, right) && refsOnly(b, left))
        case EqualNullSafe(a, b) =>   // <=> is also extractable as an equi key
          (refsOnly(a, left) && refsOnly(b, right)) ||
          (refsOnly(a, right) && refsOnly(b, left))
        case _ => false
      }
      if (hasEqui) return None

      // find ts >= lo and ts <= hi with the same point expression ts,
      // point side and interval side on opposite children
      val bounds = for {
        ge <- conjuncts.collect {
          case GreaterThanOrEqual(a, b) => (a, b)          // a >= b: a is ts
          case LessThanOrEqual(a, b)    => (b, a)          // a <= b: b is ts
        }
        le <- conjuncts.collect {
          case LessThanOrEqual(a, b)    => (a, b)          // a <= b: a is ts
          case GreaterThanOrEqual(a, b) => (b, a)          // a >= b: b is ts
        }
        if ge._1.semanticEquals(le._1) && bandable(ge._1)
        (ts, lo, hi) = (ge._1, ge._2, le._2)
        sides <- (
          if (refsOnly(ts, left) && refsOnly(lo, right) && refsOnly(hi, right))
            Some((true, ts, lo, hi))
          else if (refsOnly(ts, right) && refsOnly(lo, left) && refsOnly(hi, left))
            Some((false, ts, lo, hi))
          else None)
      } yield sides

      bounds.headOption.map { case (pointIsLeft, ts, lo, hi) =>
        val (pointSide, intervalSide) = if (pointIsLeft) (left, right) else (right, left)
        val bandP = Alias(band(ts, w), "__graft_band_p")()
        val pointB = Project(pointSide.output :+ bandP, pointSide)
        val bandI = AttributeReference("__graft_band_i", LongType)()
        // Sequence is TimeZoneAwareExpression: without a timeZoneId it
        // reports unresolved and fails optimizer plan validation, even
        // for a pure-long sequence. The If guards inverted intervals
        // (hi < lo): Sequence would THROW on a descending range, where
        // the original nested loop simply matched nothing — explode of
        // NULL preserves the no-match semantics.
        val bandLo = band(lo, w)
        val bandHi = band(hi, w)
        val seq = If(LessThanOrEqual(bandLo, bandHi),
          Sequence(bandLo, bandHi, Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)),
          Literal.create(null, org.apache.spark.sql.types.ArrayType(LongType)))
        val intervalB = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(bandI), intervalSide)
        val newCond = And(EqualTo(bandP.toAttribute, bandI), cond)
        val (nl, nr) = if (pointIsLeft) (pointB, intervalB) else (intervalB, pointB)
        Join(nl, nr, Inner, Some(newCond), hint)
      }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }
}
