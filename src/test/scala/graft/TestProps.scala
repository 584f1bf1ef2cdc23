package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Shared plain-ScalaCheck property loop (the scalatestplus bridge is
  * not on the offline classpath): 100 deterministic samples per
  * property, seeded by index so failures reproduce exactly.
  */
object TestProps {
  def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 100).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(t => f(t._1, t._2))
}
