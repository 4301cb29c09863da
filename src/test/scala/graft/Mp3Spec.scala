package graft

import graft.ops.{Mp3, Mp3Fixture}

class Mp3Spec extends SparkSpec {

  test("frame census matches the fixture formulas (all files)") {
    for (i <- 0 until Mp3Fixture.count) {
      val c = Mp3.census(f"clip_$i%03d.mp3", Mp3Fixture.mp3Bytes(i))
      val frames = Mp3Fixture.framesOf(i)
      val kbps = (0 until frames).map(f => Mp3.kbpsTable(Mp3Fixture.brIdxOf(i, f)))
      assert(c.n_frames === frames.toLong)
      assert(c.sample_rate === Mp3.srTable(Mp3Fixture.srIdxOf(i)))
      assert(c.is_cbr === (if (kbps.distinct.size == 1) 1 else 0))
      assert(c.kbps_min === kbps.min && c.kbps_max === kbps.max)
      assert(c.pad_frames ===
        (0 until frames).map(f => Mp3Fixture.padOf(i, f).toLong).sum)
      assert(c.duration_us ===
        frames.toLong * 1152L * 1000000L / c.sample_rate)
      assert(c.total_bytes === Mp3Fixture.mp3Bytes(i).length.toLong)
    }
  }

  test("malformed streams refuse loudly instead of resyncing") {
    val good = Mp3Fixture.mp3Bytes(0)
    // truncated mid-frame: the walk overruns EOF
    val e1 = intercept[IllegalArgumentException] {
      Mp3.census("t.mp3", good.take(good.length - 10))
    }
    assert(e1.getMessage.contains("truncated") ||
      e1.getMessage.contains("overran") || e1.getMessage.contains("sync"))
    // free-format frame (bitrate index 0) is out of the census contract
    val free = good.clone()
    free(2) = ((0 << 4) | (free(2) & 0x0f)).toByte
    val e2 = intercept[IllegalArgumentException] {
      Mp3.census("f.mp3", free)
    }
    assert(e2.getMessage.contains("bitrate index"))
    // garbage where the second frame's sync should be
    val bad = good.clone()
    val len0 = Mp3.frameLen(
      Mp3.kbpsTable(Mp3Fixture.brIdxOf(0, 0)),
      Mp3.srTable(Mp3Fixture.srIdxOf(0)), Mp3Fixture.padOf(0, 0))
    bad(len0) = 0x00
    val e3 = intercept[IllegalArgumentException] {
      Mp3.census("b.mp3", bad)
    }
    assert(e3.getMessage.contains("sync"))
  }

  test("censusOf decodes the on-disk fixture through binaryFile") {
    val dir = Mp3Fixture.ensure()
    val got = Mp3.censusOf(
        spark.read.format("binaryFile").load(dir + "/*.mp3"))
      .collect().map(c => c.file_name -> c).toMap
    assert(got.size === Mp3Fixture.count)
    for (i <- 0 until Mp3Fixture.count)
      assert(got(f"clip_$i%03d.mp3").n_frames === Mp3Fixture.framesOf(i).toLong)
  }
}
