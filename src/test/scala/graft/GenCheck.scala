package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper (the scalatest↔scalacheck
  * bridge artifact isn't in the offline cache; raw scalacheck is).
  */
trait GenCheck {
  def forAllSeeded[A](gen: Gen[A], trials: Int = 100)(body: A => Unit): Unit = {
    (0 until trials).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }
  }
}
