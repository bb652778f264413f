package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic ScalaCheck sampling shared by the property specs —
  * no scalatest bridge exists in the offline dependency set, so specs
  * draw `n` samples with sequential seeds themselves. */
object PropertySampling {
  def forAllSeeded[T](gen: Gen[T], n: Int = 30)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
}
