package graft.plans

import org.scalacheck.{Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Dag.Dependency

class DagSpec extends AnyFunSuite {

  private val deps = Seq(
    Dependency("Policies", None, 0),
    Dependency("Organisations", None, 0),
    Dependency("Claims", Some("Policies"), 1),
    Dependency("Summary", Some("Claims"), 2),
    Dependency("Ghost", None, 1) // no registered job
  )
  private val registry = Set("nis_policies", "nis_organisations", "nis_claims", "nis_summary")

  test("layering groups by layer, filters unregistered jobs (O1)") {
    val layers = Dag.layeredJobs(deps, registry, "nis_")
    assert(layers(0).toSet == Set("nis_policies", "nis_organisations"))
    assert(layers(1) == Seq("nis_claims"))
    assert(layers(2) == Seq("nis_summary"))
    assert(!layers.values.flatten.toSet.contains("nis_ghost"))
  }

  test("parent-before-child violations detected") {
    val bad = deps :+ Dependency("Early", Some("Summary"), 1)
    assert(Dag.layerViolations(bad) == Seq(("Early", "Summary")))
    assert(Dag.layerViolations(deps).isEmpty)
  }

  test("batches: cover, disjoint, ordered, bounded (O2, property)") {
    val prop = Prop.forAll { (jobs: List[String], sizeRaw: Int) =>
      val size = math.abs(sizeRaw % 7) + 1
      val bs = Dag.batches(jobs, size)
      bs.flatten == jobs && // cover + order
        bs.forall(_.size <= size) &&
        bs.dropRight(1).forall(_.size == size) // contiguous fill
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("25-job reference batch size splits 60 jobs into 25/25/10") {
    val bs = Dag.batches((1 to 60).map("j" + _), 25)
    assert(bs.map(_.size) == Seq(25, 25, 10))
  }
}
