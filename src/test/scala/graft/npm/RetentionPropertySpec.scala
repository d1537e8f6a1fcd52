package graft.npm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Retention._

/** Property tests for the retention core (SURVEY §5.2.1): invariants that
  * must hold for ANY arrival sequence, not just the fixture cases.
  */
class RetentionPropertySpec extends AnyFunSuite {

  private val arrivalsGen: Gen[List[ZipArrival]] = for {
    n <- Gen.choose(0, 40)
    arrivals <- Gen.listOfN(n, for {
      deleted <- Gen.oneOf(true, false, false, false)
      trig <- Gen.oneOf(true, true, false)
      id <- Gen.choose(1, 999)
    } yield (deleted, trig, id))
  } yield arrivals.zipWithIndex.map { case ((del, trig, id), i) =>
    ZipArrival("p", s"${if (del) "Deleted-" else ""}f$id-$i.zip", i.toLong, trig)
  }

  private def samples(count: Int): Seq[List[ZipArrival]] = {
    var seed = Seed(7L)
    (1 to count).map { _ =>
      val v = arrivalsGen.apply(Gen.Parameters.default, seed).get
      seed = seed.next
      v
    }
  }

  test("at most one eviction per triggered arrival; none for untriggered") {
    samples(300).foreach { arrivals =>
      val (_, evs) = replayPackage("p", arrivals.iterator)
      val triggered = arrivals.count(_.retention_triggered)
      assert(evs.size <= triggered)
      // each eviction's ctime is the ctime of some triggered arrival
      val trigTimes = arrivals.filter(_.retention_triggered).map(_.ctime).toSet
      assert(evs.forall(e => trigTimes.contains(e.ctime)))
    }
  }

  test("evicted files were present and are never evicted twice") {
    samples(300).foreach { arrivals =>
      val (state, evs) = replayPackage("p", arrivals.iterator)
      val names = arrivals.map(_.file_name)
      assert(evs.map(_.deleted_zip_path).distinct.size == evs.size)
      evs.foreach(e => assert(names.contains(e.deleted_zip_path.stripPrefix("p/"))))
      // final state + evictions == all arrivals (conservation)
      val finalNames = state.map(_._1) ++ evs.map(_.deleted_zip_path.stripPrefix("p/"))
      assert(finalNames.sorted == names.sorted)
    }
  }

  test("a file is only evicted when its successor-at-decision-time is not Deleted-*") {
    // re-run the replay manually and check each eviction against the
    // reference rule at the moment of decision
    samples(300).foreach { arrivals =>
      var state = Vector.empty[(String, Long)]
      arrivals.sortBy(a => (a.ctime, a.file_name)).foreach { a =>
        if (a.retention_triggered) {
          evictOne(state) match {
            case Some(victim) =>
              val sorted = state.filter(_._1.toLowerCase.endsWith(".zip")).sortBy(f => (f._2, f._1))
              val idx = sorted.indexWhere(_._1 == victim)
              assert(idx >= 0 && idx + 1 < sorted.size)
              assert(!sorted(idx + 1)._1.toLowerCase.contains("deleted"))
              // everything older than the victim has a Deleted successor
              (0 until idx).foreach(i => assert(sorted(i + 1)._1.toLowerCase.contains("deleted")))
              state = state.filterNot(_._1 == victim)
            case None =>
              val zips = state.filter(_._1.toLowerCase.endsWith(".zip"))
              val sorted = zips.sortBy(f => (f._2, f._1))
              assert(zips.size < model.RetentionLimit ||
                sorted.sliding(2).forall {
                  case Seq(_, (next, _)) => next.toLowerCase.contains("deleted")
                  case _ => true
                })
          }
        }
        state :+= (a.file_name, a.ctime)
      }
    }
  }
}
