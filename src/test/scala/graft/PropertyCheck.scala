package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Minimal scalacheck-in-scalatest bridge (the scalatestplus artifact is
  * not in the offline cache). Properties assert inside the body; a thrown
  * assertion fails the Prop.
  */
trait PropertyCheck {
  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)

  def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    run(Prop.forAll(g) { a => body(a); true })

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    run(Prop.forAll(ga, gb) { (a, b) => body(a, b); true })

  private def run(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
