package graft.viz

/** Test-only bridge into the renderer's private internals. */
object MollweideTestAccess {
  def ramp(t: Double): Int = Mollweide.rampColor(t)
  def invert(px: Double, py: Double): Option[(Double, Double)] = Mollweide.invert(px, py)
}
