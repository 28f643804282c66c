package graft.operators

import scala.annotation.tailrec

/** Dependency closure over the compound-member DAG: which compound
  * series must recompute when a set of member series changed.
  *
  * The reference uses a recursive CTE
  * (`WITH RECURSIVE`, `inst/patches/patch_41.R:2516-2537,2958-2973`
  * in YukonWRB/AquaCache); Spark has no recursive CTE, and the edge
  * set is tiny metadata — so this is a driver-side iterate-to-fixpoint
  * (SURVEY §2.3). Compounds can stack on compounds; cycles are
  * rejected at definition time (CorrectedReader), so the fixpoint
  * terminates in <= depth iterations.
  */
object CompoundClosure {

  /** @param memberOf edges member -> compounds containing it
    * @return all series needing recompute, in dependency order
    *         (changed members first, dependents after)
    */
  def affected(memberOf: Map[Long, Seq[Long]], changed: Set[Long]): Seq[Long] = {
    @tailrec
    def fix(frontier: Set[Long], seen: Set[Long], order: Vector[Long]): Vector[Long] = {
      val next = frontier.flatMap(id => memberOf.getOrElse(id, Nil)).diff(seen)
      if (next.isEmpty) order
      else fix(next, seen ++ next, order ++ next.toSeq.sorted)
    }
    val start = changed.toSeq.sorted.toVector
    fix(changed, changed, start)
  }
}
