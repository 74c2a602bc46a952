package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q116 cap lesson, made permanent (round-15 verdict item 7): a
  * reader cap that is "generous" at sf0.01 can reject the engine's OWN
  * data at sf100 (a 100k record cap met 166k-record shards). This spec
  * names EVERY container/media reader cap and pins it to one of two
  * legitimate sources:
  *
  *  - the FORMAT's own bound (a field width: ZIP's u16 entry count and
  *    u16 EOCD comment, tar's 11-digit octal size), or
  *  - the shared cost-model constant (one decoded member/record must
  *    fit in an executor task: 64 MiB), plus count caps that must
  *    clear the engine's own sf100-scale output by a wide margin.
  *
  * A future cap edit that drifts from both sources fails here BEFORE a
  * scale rung can meet it.
  */
class ReaderCapsSpec extends AnyFunSuite {
  import graft.{sources => src}

  /** The one cost-model payload cap: a single decompressed member /
    * record / sample payload must fit comfortably in task memory.
    * Uniform across every container family by design.
    */
  private val MemberCap = 64L << 20

  test("format-bound caps equal the format's own field widths") {
    assert(src.Zip.MaxEntries === 0xFFFF,
      "ZIP EOCD total-entries is a u16 — the cap IS the format bound")
    assert(src.Zip.MaxCommentScan === 0xFFFF,
      "ZIP EOCD comment length is a u16; the scan floor adds the fixed " +
        "22-byte EOCD separately, so a maximal legal comment stays " +
        "findable")
  }

  test("payload caps are the single shared cost-model constant") {
    assert(src.Warc.MaxRecordLen === MemberCap)
    assert(src.Tfrecord.MaxRecordLen === MemberCap)
    assert(src.Tar.MaxMemberLen === MemberCap)
    assert(src.Zip.MaxMemberLen === MemberCap)
    assert(src.TfExample.MaxListLen === MemberCap)
    assert(graft.multimodal.Mp4.MaxUnits === MemberCap)
  }

  test("payload caps stay REPRESENTABLE in each format's own size field") {
    // tar size = 11 octal digits → 8^11 - 1; a cap above this could
    // admit members whose headers cannot be round-tripped
    assert(src.Tar.MaxMemberLen < math.pow(8, 11).toLong)
    // ZIP sizes are u32 (zip64 is rejected explicitly)
    assert(src.Zip.MaxMemberLen < 0xFFFFFFFFL)
  }

  test("count caps clear the engine's own sf100-scale output with a " +
      "wide margin (the q116 lesson, quantified)") {
    // TFRecord: sf100 writeShards emitted ~166k records/shard (5M docs
    // over 32 partitions, dev/sweeps r15); parsing is linear in bytes,
    // so the cap guards only the minimum-size-record flood
    val sf100RecordsPerShard = 5000000L / 30L
    assert(src.Tfrecord.MaxRecords.toLong >= 50L * sf100RecordsPerShard,
      "TFRecord record cap must clear sf100 shards 50x over")
    // per-archive planted fixtures are small; 100x headroom documented
    assert(src.Warc.MaxRecords >= (1 << 20)) // multi-doc crawl shards
    assert(src.Tar.MaxEntries >= (1 << 20))
    // tf.Example features per example: planted 3; spec headroom 1000x
    assert(src.TfExample.MaxFeatures >= 3 * 1000)
    // MP4 sample tables: planted frame counts ≤ 48/doc; 2000x headroom
    assert(graft.multimodal.Mp4.MaxSamples >= 48 * 2000)
  }
}
