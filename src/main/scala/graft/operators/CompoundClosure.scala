package graft.operators

import scala.collection.mutable

/** Dependency closure over the compound-member DAG: which compound
  * series must recompute when a set of member series changed.
  *
  * The reference uses a recursive CTE
  * (`WITH RECURSIVE`, `inst/patches/patch_41.R:2516-2537,2958-2973`
  * in YukonWRB/AquaCache); Spark has no recursive CTE, and the edge
  * set is tiny metadata — so this is a driver-side iterate-to-fixpoint
  * (SURVEY §2.3). Compounds can stack on compounds; cycles are
  * rejected at definition time (CorrectedReader), and guarded against
  * here as a backstop.
  */
object CompoundClosure {

  /** @param memberOf edges member -> compounds containing it
    * @return all series needing recompute in TOPOLOGICAL order of the
    *         induced subgraph: every member precedes every compound
    *         that (transitively) contains it. Nodes are emitted by
    *         longest-path level from the changed set (ties by id) —
    *         min-depth BFS is NOT topological on diamond DAGs (with
    *         1->{2,3}, 3->2, compound 2 must recompute AFTER 3 even
    *         though BFS reaches both at depth 1).
    */
  def affected(memberOf: Map[Long, Seq[Long]], changed: Set[Long]): Seq[Long] = {
    // longest-path relaxation: level(n) = max over predecessors + 1.
    // Terminates in <= |affected| rounds on a DAG.
    val level = mutable.Map[Long, Int](changed.toSeq.map(_ -> 0): _*)
    var frontier: Set[Long] = changed
    var rounds = 0
    while (frontier.nonEmpty) {
      rounds += 1
      if (rounds > level.size + memberOf.size + 1)
        throw new IllegalArgumentException(
          s"compound dependency cycle reachable from ${changed.mkString(",")}"
        )
      val next = mutable.Set[Long]()
      for (u <- frontier; v <- memberOf.getOrElse(u, Nil)) {
        val lv = level(u) + 1
        if (level.getOrElse(v, -1) < lv) { level(v) = lv; next += v }
      }
      frontier = next.toSet
    }
    level.toSeq.sortBy { case (id, l) => (l, id) }.map(_._1)
  }
}
