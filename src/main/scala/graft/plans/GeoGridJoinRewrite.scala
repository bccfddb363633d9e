package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Catalyst optimizer rule: auto-rewrite a naive geo radius join —
  * `big.crossJoin(dim).filter(haversineKm(...) <= r)`, which plans as a
  * BroadcastNestedLoopJoin evaluating the trig against EVERY (row, dim)
  * pair — into the grid-bucketed equi-join of [[graft.ops.core.geoGridJoin]]
  * (single cell key on the left, 1-ring neighbor explode on the right,
  * exact haversine refine kept as the non-equi remainder), which plans as a
  * hash join on a 2-int key.
  *
  * This is the engine's answer to the reference's per-event airport-store
  * scan (AirportAircraftCountStream.java:224-235) at the OPTIMIZER level:
  * a user can write the declarative theta join and the plan comes out
  * bucketed. `core.geoGridJoin` remains the explicit form for callers who
  * want to hand-tune cell sizes.
  *
  * Matching: the exact expression tree `core.haversineKm` produces (the
  * repo's only haversine builder; also the tree a straightforward port of
  * the reference's formula yields), as a `<=`/`<` conjunct against a
  * double literal in an inner/cross join condition — after constant
  * folding, so the rule composes with the default optimizer batches. The
  * rewrite keeps the ORIGINAL predicate as the refine filter, so it is
  * correctness-neutral by construction; cells only decide which pairs are
  * CONSIDERED, and the sizing below guarantees no qualifying pair is
  * missed:
  *
  *   - cellLatDeg = radius / 110.0 km/deg (conservative meridian degree),
  *     so matching rows are never more than one lat cell apart;
  *   - cellLonDeg = the smallest divisor of 360 covering the EXACT
  *     worst-case longitude span of a radius-r pair below the polar cut:
  *     from hav(d/R) >= cosφ₁·cosφ₂·hav(Δlon), a qualifying pair obeys
  *     Δlon <= 2·asin(sin(r/2R)/√(cosφ₁cosφ₂)) <= 2·asin(sin(r/2R)/cos 80°)
  *     when both |lat| <= 80°. (The linearized r/(111.195·cos 80°) bound
  *     slightly UNDERESTIMATES this — asin is superlinear — which opened
  *     miss bands just under each divisor; the asin form closes them.)
  *     pmod wraps the ring at the antimeridian.
  *   - rows within one lat cell of the 80° polar cut or above it get a
  *     catch-all lon cell (-1): left rows with |lat| > 80 - cellLatDeg map
  *     to it directly, right rows with |lat| > 80 - 2·cellLatDeg emit it
  *     for their 3 lat neighbors (sentinel -2 when not, which can never
  *     match). The margin makes cut-straddling pairs (left just below 80°,
  *     right above — where √(cosφ₁cosφ₂) < cos 80° and lon cells can be 2
  *     apart) meet in the catch-all instead of relying on lon cells at
  *     all: any right row within r of a catch-all left row satisfies
  *     |rLat| > 80 - cellLatDeg - r/111.195 > 80 - 2·cellLatDeg, so its
  *     polar emission is present, and their lat cells differ by at most 1.
  *     Longitude compression at the poles therefore cannot create misses.
  *
  * Each qualifying pair matches exactly ONE emitted cell (normal lon cells
  * are distinct mod nLon >= 3; the polar cell is distinct from them), so
  * the rewrite introduces no duplicate rows. Radii needing cellLatDeg >
  * the 10° polar margin or cellLonDeg > 120° are left unrewritten (the
  * naive plan is the honest one at continental radii).
  */
object GeoGridJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val PolarCutDeg = 80.0
  private val LonDivisors = Seq(1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 8.0,
    9.0, 10.0, 12.0, 15.0, 18.0, 20.0, 24.0, 30.0, 36.0, 40.0, 45.0, 60.0,
    72.0, 90.0, 120.0)

  private def d(v: Double): Literal = Literal(v, DoubleType)
  private def i(v: Int): Literal = Literal(v, IntegerType)

  /** core.haversineKm's tree: 12742 * atan2(sqrt(a), sqrt(1 - a)). */
  private object HaversineDist {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression)] =
      e match {
        case Multiply(Literal(c: Double, DoubleType),
            Atan2(Sqrt(a1), Sqrt(Subtract(Literal(one: Double, DoubleType), a2, _))), _)
            if c == 12742.0 && one == 1.0 && a1.semanticEquals(a2) =>
          matchHalfAngles(a1)
        case _ => None
      }

    // a = sin²(Δlat/2) + cos(lat1)·cos(lat2)·sin²(Δlon/2)  (radians)
    private def matchHalfAngles(a: Expression)
        : Option[(Expression, Expression, Expression, Expression)] = a match {
      case Add(
          Pow(Sin(Divide(ToRadians(Subtract(lat2a, lat1a, _)), Literal(t1, DoubleType), _)),
            Literal(p1, DoubleType)),
          Multiply(
            Multiply(Cos(ToRadians(lat1b)), Cos(ToRadians(lat2b)), _),
            Pow(Sin(Divide(ToRadians(Subtract(lon2, lon1, _)), Literal(t2, DoubleType), _)),
              Literal(p2, DoubleType)), _), _)
          if t1 == 2.0 && t2 == 2.0 && p1 == 2.0 && p2 == 2.0 &&
            lat1a.semanticEquals(lat1b) && lat2a.semanticEquals(lat2b) =>
        Some((lat1a, lon1, lat2a, lon2))
      case _ => None
    }
  }

  /** haversine(...) <= r (or <, or the mirrored literal-first forms). */
  private object RadiusPredicate {
    def unapply(e: Expression)
        : Option[(Expression, Expression, Expression, Expression, Double)] = e match {
      case LessThanOrEqual(HaversineDist(a, b, c, dd), Literal(r: Double, DoubleType)) =>
        Some((a, b, c, dd, r))
      case LessThan(HaversineDist(a, b, c, dd), Literal(r: Double, DoubleType)) =>
        Some((a, b, c, dd, r))
      case GreaterThanOrEqual(Literal(r: Double, DoubleType), HaversineDist(a, b, c, dd)) =>
        Some((a, b, c, dd, r))
      case GreaterThan(Literal(r: Double, DoubleType), HaversineDist(a, b, c, dd)) =>
        Some((a, b, c, dd, r))
      case _ => None
    }
  }

  /** Don't re-bucket a join that is already cell-keyed (this rule's marker
    * or a manual core.geoGridJoin). */
  private def alreadyBucketed(plans: LogicalPlan*): Boolean =
    plans.exists(_.output.exists(a =>
      a.name == "_g_cell_lat" || a.name == "_cell_lat"))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(l, r, Inner | Cross, Some(cond), _) if !alreadyBucketed(l, r) =>
      splitConjunctivePredicates(cond).collectFirst {
        case RadiusPredicate(lat1, lon1, lat2, lon2, radius) =>
          rewrite(j, lat1, lon1, lat2, lon2, radius)
      }.flatten.getOrElse(j)
  }

  private def rewrite(j: Join, lat1: Expression, lon1: Expression,
                      lat2: Expression, lon2: Expression,
                      radiusKm: Double): Option[LogicalPlan] = {
    val Join(l, r, _, Some(cond), hint) = j: @unchecked
    // assign coordinate pairs to sides; bail if they straddle
    val refs1 = lat1.references ++ lon1.references
    val refs2 = lat2.references ++ lon2.references
    val sides =
      if (refs1.subsetOf(l.outputSet) && refs2.subsetOf(r.outputSet))
        Some((lat1, lon1, lat2, lon2))
      else if (refs2.subsetOf(l.outputSet) && refs1.subsetOf(r.outputSet))
        Some((lat2, lon2, lat1, lon1))
      else None
    sides.flatMap { case (lLat, lLon, rLat, rLon) =>
      if (radiusKm <= 0) None
      else {
        val cellLatDeg = math.max(radiusKm / 110.0, 0.1)
        // exact max Δlon of a radius-r pair with both |lat| <= PolarCut:
        // sin(Δlon/2)·√(cosφ₁cosφ₂) <= sin(r/2R), worst case at the cut.
        // (2R = 12742 km, matching haversineKm's constant.)
        val sinHalf = math.sin(radiusKm / 12742.0) /
          math.cos(math.toRadians(PolarCutDeg))
        val minLonDeg =
          if (sinHalf >= 1.0) Double.PositiveInfinity
          else 2.0 * math.toDegrees(math.asin(sinHalf))
        val lonDegOpt = LonDivisors.find(_ >= minLonDeg)
        if (cellLatDeg > 90.0 - PolarCutDeg || lonDegOpt.isEmpty) None
        else Some(build(l, r, cond, hint, lLat, lLon, rLat, rLon,
          cellLatDeg, lonDegOpt.get))
      }
    }
  }

  private def latCell(lat: Expression, cellLatDeg: Double): Expression =
    Cast(Floor(Divide(Add(lat, d(90.0)), d(cellLatDeg))), IntegerType)

  private def lonCellRaw(lon: Expression, cellLonDeg: Double, nLon: Int): Expression =
    Pmod(Cast(Floor(Divide(Add(lon, d(180.0)), d(cellLonDeg))), IntegerType), i(nLon))

  private def build(l: LogicalPlan, r: LogicalPlan, cond: Expression,
                    hint: JoinHint,
                    lLat: Expression, lLon: Expression,
                    rLat: Expression, rLon: Expression,
                    cellLatDeg: Double, cellLonDeg: Double): LogicalPlan = {
    val nLon = math.round(360.0 / cellLonDeg).toInt // >= 3 by LonDivisors cap

    // LEFT: one (latCell, lonCell) key; rows within one lat cell of the
    // polar cut (or above it) get the catch-all -1, so cut-straddling
    // pairs never depend on lon-cell adjacency.
    val lLatAlias = Alias(latCell(lLat, cellLatDeg), "_g_cell_lat")()
    val lLonAlias = Alias(
      If(GreaterThan(Abs(lLat), d(PolarCutDeg - cellLatDeg)),
        i(-1), lonCellRaw(lLon, cellLonDeg, nLon)), "_g_cell_lon")()
    val newL = Project(l.output ++ Seq(lLatAlias, lLonAlias), l)

    // RIGHT: base cell + polar flag, then explode the 1-ring neighbors
    // plus the 3 polar catch-all entries (sentinel -2 when not near the
    // cut — the left side never produces -2, so they can never match).
    // Emission depth 2·cellLatDeg matches the widened left threshold:
    // every right row within r of a catch-all left row carries the flag.
    val rcLat = Alias(latCell(rLat, cellLatDeg), "_g_rc_lat")()
    val rcLon = Alias(lonCellRaw(rLon, cellLonDeg, nLon), "_g_rc_lon")()
    val nearPole = Alias(
      GreaterThan(Abs(rLat), d(PolarCutDeg - 2.0 * cellLatDeg)), "_g_polar")()
    val rBase = Project(r.output ++ Seq(rcLat, rcLon, nearPole), r)
    val (rcLatA, rcLonA, polarA) =
      (rcLat.toAttribute, rcLon.toAttribute, nearPole.toAttribute)

    def cellStruct(la: Expression, lo: Expression): Expression =
      CreateNamedStruct(Seq(Literal("la"), la, Literal("lo"), lo))
    val ring = for { dLat <- -1 to 1; dLon <- -1 to 1 } yield
      cellStruct(Add(rcLatA, i(dLat)), Pmod(Add(rcLonA, i(dLon)), i(nLon)))
    val polarRing = for { dLat <- -1 to 1 } yield
      cellStruct(Add(rcLatA, i(dLat)), If(polarA, i(-1), i(-2)))
    val explode = Explode(CreateArray(ring ++ polarRing))
    val genOut = explode.elementSchema.map(f =>
      AttributeReference("_g_cell", f.dataType, f.nullable)())
    val gen = Generate(explode, Nil, outer = false, None, genOut, rBase)
    val rLatAlias = Alias(GetStructField(genOut.head, 0, Some("la")), "_g_r_cell_lat")()
    val rLonAlias = Alias(GetStructField(genOut.head, 1, Some("lo")), "_g_r_cell_lon")()
    val newR = Project(r.output ++ Seq(rLatAlias, rLonAlias), gen)

    // cell equi-keys (hash-joinable) + the ORIGINAL predicate as refine
    val newCond = And(
      And(EqualTo(lLatAlias.toAttribute, rLatAlias.toAttribute),
        EqualTo(lLonAlias.toAttribute, rLonAlias.toAttribute)),
      cond)
    Project(l.output ++ r.output, Join(newL, newR, Inner, Some(newCond), hint))
  }
}
