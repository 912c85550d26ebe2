package graft.transport

/** NATS NKeys (the public spec at github.com/nats-io/nkeys): ed25519
  * identities carried as base32-encoded, CRC-16-guarded strings — seeds
  * (`SU…` for users) hold the raw 32-byte ed25519 seed, public keys (`U…`)
  * hold the raw public key. Auth is a nonce signature: the server's INFO
  * carries a `nonce`, the client signs it with the seed's private key and
  * sends `nkey` (its public key) + `sig` (base64-url, no padding); the
  * server verifies against the configured public key.
  *
  * The ed25519 primitive comes from Tink (`com.google.crypto.tink.subtle`),
  * which ships on every Spark classpath — `newKeyPairFromSeed` gives the
  * RFC-8032 seed→keypair derivation the JDK's EdDSA API lacks. Everything
  * else (base32 codec, CRC-16/XMODEM, prefix framing) is this file.
  */
object NKeys {

  private val B32 = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val PrefixSeed = 18 << 3 // 'S'
  private val PrefixUser = 20 << 3 // 'U'

  // ---------------- base32 (RFC 4648 upper, no padding) ----------------

  private[transport] def b32encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var buf = 0L
    var bits = 0
    bytes.foreach { b =>
      buf = (buf << 8) | (b & 0xFF)
      bits += 8
      while (bits >= 5) {
        sb.append(B32(((buf >> (bits - 5)) & 31).toInt))
        bits -= 5
      }
    }
    if (bits > 0) sb.append(B32(((buf << (5 - bits)) & 31).toInt))
    sb.toString
  }

  private[transport] def b32decode(s: String): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var buf = 0L
    var bits = 0
    s.foreach { c =>
      val v = B32.indexOf(c)
      require(v >= 0, s"invalid base32 character '$c'")
      buf = (buf << 5) | v
      bits += 5
      if (bits >= 8) {
        out += ((buf >> (bits - 8)) & 0xFF).toByte
        bits -= 8
      }
    }
    out.result()
  }

  // ---------------- CRC-16/XMODEM (the nkeys checksum) ----------------

  private[transport] def crc16(data: Array[Byte]): Int = {
    var crc = 0
    data.foreach { b =>
      crc ^= (b & 0xFF) << 8
      var i = 0
      while (i < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xFFFF
              else (crc << 1) & 0xFFFF
        i += 1
      }
    }
    crc
  }

  private def withCrc(payload: Array[Byte]): Array[Byte] = {
    val c = crc16(payload)
    payload ++ Array((c & 0xFF).toByte, ((c >> 8) & 0xFF).toByte) // LE
  }

  private def checkCrc(decoded: Array[Byte], what: String): Array[Byte] = {
    require(decoded.length > 2, s"$what too short")
    val payload = decoded.dropRight(2)
    val got = (decoded(decoded.length - 2) & 0xFF) |
      ((decoded(decoded.length - 1) & 0xFF) << 8)
    require(got == crc16(payload), s"$what checksum mismatch")
    payload
  }

  // ---------------- seed / public key framing ----------------

  /** encode a raw 32-byte ed25519 seed as a USER seed string (`SU…`) */
  def encodeUserSeed(rawSeed: Array[Byte]): String = {
    require(rawSeed.length == 32, "ed25519 seed must be 32 bytes")
    val b1 = (PrefixSeed | (PrefixUser >> 5)).toByte
    val b2 = ((PrefixUser & 31) << 3).toByte
    b32encode(withCrc(Array(b1, b2) ++ rawSeed))
  }

  /** decode a USER seed string to the raw 32-byte ed25519 seed */
  def decodeUserSeed(seed: String): Array[Byte] = {
    require(seed.startsWith("SU"), "not a user seed (must start with 'SU')")
    val payload = checkCrc(b32decode(seed), "seed")
    require(payload.length == 34, s"seed payload length ${payload.length}")
    payload.drop(2)
  }

  /** derive the public NKey (`U…`) from a user seed */
  def publicKeyFromSeed(seed: String): String = {
    val kp = com.google.crypto.tink.subtle.Ed25519Sign.KeyPair
      .newKeyPairFromSeed(decodeUserSeed(seed))
    b32encode(withCrc(Array(PrefixUser.toByte) ++ kp.getPublicKey))
  }

  /** raw public key bytes of a `U…` public NKey string */
  def decodePublicKey(pub: String): Array[Byte] = {
    require(pub.startsWith("U"), "not a user public key (must start with 'U')")
    val payload = checkCrc(b32decode(pub), "public key")
    require(payload.length == 33, s"public key payload length ${payload.length}")
    payload.drop(1)
  }

  // ---------------- nonce signatures ----------------

  /** sign the server nonce with the seed's key; base64-url, no padding
    * (the `sig` field of CONNECT) */
  def sign(seed: String, nonce: Array[Byte]): String = {
    val kp = com.google.crypto.tink.subtle.Ed25519Sign.KeyPair
      .newKeyPairFromSeed(decodeUserSeed(seed))
    val signer = new com.google.crypto.tink.subtle.Ed25519Sign(kp.getPrivateKey)
    java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(signer.sign(nonce))
  }

  /** verify a CONNECT signature against a `U…` public key and the nonce */
  def verify(pub: String, nonce: Array[Byte], sigB64: String): Boolean =
    try {
      val sig = java.util.Base64.getUrlDecoder.decode(sigB64)
      new com.google.crypto.tink.subtle.Ed25519Verify(decodePublicKey(pub))
        .verify(sig, nonce)
      true
    } catch { case _: Exception => false }
}
