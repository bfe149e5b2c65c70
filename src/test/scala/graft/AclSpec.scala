package graft

import graft.operators.Entities

/** Semantic invariants of the hierarchy-resolved ACL walk (value-level
  * equality is the DuckDB oracle's job) — pinning the properties of
  * OzoneNativeAuthorizer's evaluation the rollup must preserve.
  */
class AclSpec extends SparkSpec {

  private lazy val rows = Entities.nsAclEffective(spark, sf).collect().map {
    r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
      r.getBoolean(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8), r.getLong(9), r.getLong(10))
  }

  test("denial attribution partitions the key set at every grouping") {
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, b, rt, _, nKeys, allowed, dk, dp, db, dv) =>
      assert(allowed + dk + dp + db + dv == nKeys,
        s"($u,$v,$b,$rt): counts do not partition the keys")
    }
  }

  test("the volume owner bypasses every level of the walk") {
    // OzoneNativeAuthorizer.java:160-163: isOwner short-circuits to allow.
    rows.filter(_._5).foreach { case (u, v, _, rt, _, nKeys, allowed,
      dk, dp, db, dv) =>
      assert(u == "u" + v.stripPrefix("vol"), s"$u marked owner of $v")
      assert(allowed == nKeys && dk + dp + db + dv == 0,
        s"owner $u denied in own volume $v right $rt")
    }
    // Non-owners never get the owner flag.
    rows.filterNot(_._5).foreach { case (u, v, _, _, _, _, _, _, _, _, _) =>
      assert(u != "u" + v.stripPrefix("vol"))
    }
  }

  test("volume and bucket grants disagree in both directions") {
    // vol2 denies world READ while its even-digit buckets grant it: every
    // key that clears key+prefix+bucket in vol2/b0 must die at the VOLUME
    // level — the bucket-grants/volume-denies direction.
    val v2read = rows.find(t => t._1 == "u0" && t._2 == "vol2" &&
      t._3 == "b0" && t._4 == "READ").get
    assert(v2read._7 == 0, "vol2 READ should be fully denied for non-owners")
    assert(v2read._11 > 0, "expected volume-level denials in vol2/b0")
    // vol0 grants world WRITE while bucket b3 denies it: denials land at
    // the BUCKET level, none at the volume level — the opposite direction.
    val v0write = rows.find(t => t._1 == "u1" && t._2 == "vol0" &&
      t._3 == "b3" && t._4 == "WRITE").get
    assert(v0write._7 == 0 && v0write._10 > 0 && v0write._11 == 0,
      "vol0/b3 WRITE denials should stop at the bucket level")
  }

  test("DELETE resolves its parent checks as WRITE (the right mapping)") {
    // OzoneNativeAuthorizer.java:117-126: parent(DELETE) = WRITE, so at
    // every level above the key, DELETE and WRITE see identical grants —
    // their bucket/volume denial counts can differ only through the
    // different key-level bit (size%7 vs size%5) feeding the cascade, and
    // in a bucket whose WRITE grant is denied outright, both rights must
    // show zero volume-level denials (the walk never reaches the volume).
    rows.filter(t => !t._5 && t._2 == "vol0" && t._3 == "b4" &&
      (t._4 == "DELETE" || t._4 == "WRITE")).foreach {
      case (_, _, _, rt, _, _, allowed, _, _, db, dv) =>
        assert(allowed == 0 && dv == 0 && db > 0,
          s"$rt in vol0/b4 must be stopped at the denied bucket WRITE grant")
    }
  }

  test("READ walks never report prefix denials (prefix READ is universal)") {
    rows.filter(_._4 == "READ").foreach { t =>
      assert(t._9 == 0, s"READ prefix denial in ${t._2}/${t._3}")
    }
  }
}
