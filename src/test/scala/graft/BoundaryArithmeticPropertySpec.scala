package graft

import graft.operators.Packing
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property pins for the repack boundary arithmetic (VERDICT r13 #7):
  * `boundaryShardOf` / `shardStartPos` over the full Long range,
  * including the saturation edges — 1000 cases per property (pure JVM,
  * milliseconds). Saturation to Long.MaxValue is the conservative
  * direction: a start position no Long offset can reach means
  * "recompute nothing", which is what an unreachable boundary means.
  */
object BoundaryArithmeticPropertySpec
    extends Properties("Packing.boundaryArithmetic") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val offset: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(0L, 1L << 53),        // the documented packing range
    2 -> Gen.choose(0L, 4096L),           // small streams
    1 -> Gen.choose(Long.MaxValue - 4096L, Long.MaxValue), // the edge
    1 -> Gen.oneOf(0L, 1L, Long.MaxValue - 1, Long.MaxValue))
  private val capacity: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(1L, 65536L),
    1 -> Gen.oneOf(1L, 2L, 1L << 40, Long.MaxValue))
  private val perShard: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(1L, 1024L),
    1 -> Gen.oneOf(1L, 2L, 1L << 40, Long.MaxValue))

  property("boundary shard contains the offset") =
    forAll(offset, capacity, perShard) { (o, cap, cps) =>
      val b = Packing.boundaryShardOf(o, cap, cps)
      val start = Packing.shardStartPos(b, cap, cps)
      val next = if (b == Long.MaxValue) Long.MaxValue
        else Packing.shardStartPos(b + 1, cap, cps)
      // start <= o always; and o falls before the next shard's start
      // unless that start saturated (then "before it" is vacuous-true)
      Prop(start <= o) && Prop(next == Long.MaxValue || o < next)
    }

  property("start position is a shard multiple or saturated") =
    forAll(Gen.choose(0L, Long.MaxValue), capacity, perShard) { (b, cap, cps) =>
      val s = Packing.shardStartPos(b, cap, cps)
      s == Long.MaxValue ||
        (s % cap == 0L && Packing.boundaryShardOf(s, cap, cps) == b)
    }

  property("monotone in the boundary shard") =
    forAll(Gen.choose(0L, Long.MaxValue - 1), capacity, perShard) {
      (b, cap, cps) =>
        Packing.shardStartPos(b, cap, cps) <=
          Packing.shardStartPos(b + 1, cap, cps)
    }

  property("sentinel and zero edges") = Prop.all(
    Prop(Packing.shardStartPos(Long.MaxValue, 1L, 1L) == Long.MaxValue),
    Prop(Packing.shardStartPos(0L, Long.MaxValue, Long.MaxValue) == 0L),
    Prop(Packing.shardStartPos(1L, Long.MaxValue, 2L) == Long.MaxValue),
    Prop(Packing.shardStartPos(2L, 1L << 62, 1L) == Long.MaxValue),
    Prop(Packing.boundaryShardOf(Long.MaxValue, 1L, 1L) == Long.MaxValue),
    Prop(Packing.boundaryShardOf(Long.MaxValue, Long.MaxValue,
      Long.MaxValue) == 0L))
}
