package graft

import org.scalacheck.Gen

/** `Gen.sample` returns Option and CAN be None (retryUntil exhaustion,
  * filtered generators): `.sample.get` made property suites flake with
  * NoSuchElementException instead of running the property. Retry until
  * a sample materializes — the generators used in specs succeed with
  * overwhelming probability per attempt, so this terminates
  * immediately in practice while being structurally total.
  */
object GenUtil {
  def sampled[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()
}
