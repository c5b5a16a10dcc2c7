package graft.sources.cdc

import java.nio.charset.StandardCharsets
import java.util.Base64

import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (public RFC 5802/7677 — the default
  * PostgreSQL password auth since v10; `AuthenticationSASL` in the
  * public protocol docs). Pure JDK crypto: PBKDF2WithHmacSHA256 +
  * HmacSHA256 + SHA-256. Channel binding is not negotiated (`n,,` /
  * `c=biws`), matching a non-TLS replication connection.
  */
object ScramSha256 {

  val Mechanism = "SCRAM-SHA-256"

  def b64(b: Array[Byte]): String = Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  def hmac(key: Array[Byte], msg: String): Array[Byte] = {
    val m = Mac.getInstance("HmacSHA256")
    m.init(new SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(msg.getBytes(StandardCharsets.UTF_8))
  }

  def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] =
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations, 256))
      .getEncoded

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Parse `k1=v1,k2=v2` SCRAM attribute lists (values may contain '='
    * past the first — base64 padding).
    */
  def attrs(msg: String): Map[Char, String] =
    msg.split(",").filter(_.length >= 2).map(p => p.charAt(0) -> p.drop(2)).toMap

  /** Client-side exchange state (RFC 5802 §5). */
  final class Client(password: String, nonce: String) {
    val clientFirstBare: String = s"n=,r=$nonce"
    /** gs2-header "n,," + bare: the SASLInitialResponse payload. */
    val clientFirst: String = s"n,,$clientFirstBare"

    /** Given server-first, produce client-final and the expected
      * server signature for mutual verification.
      */
    def respond(serverFirst: String): (String, String) = {
      val a = attrs(serverFirst)
      val fullNonce = a('r')
      require(fullNonce.startsWith(nonce), "SCRAM: server nonce must extend ours")
      val salted = saltedPassword(password, unb64(a('s')), a('i').toInt)
      val clientKey = hmac(salted, "Client Key")
      val storedKey = sha256(clientKey)
      val withoutProof = s"c=biws,r=$fullNonce"
      val authMessage = s"$clientFirstBare,$serverFirst,$withoutProof"
      val proof = xor(clientKey, hmac(storedKey, authMessage))
      val serverSig = b64(hmac(hmac(salted, "Server Key"), authMessage))
      (s"$withoutProof,p=${b64(proof)}", serverSig)
    }
  }
}
