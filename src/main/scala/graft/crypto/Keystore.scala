package graft.crypto

import java.nio.file.{Files, Path, Paths}
import java.security.SecureRandom
import javax.crypto.{Cipher, SecretKey}
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import java.util.Base64

/** Local AES-256-GCM keystore — the no-KMS analogue of the reference's
  * `kmsCrypto.js` (`/root/reference/kmsCrypto.js:30,63-260`): a master
  * key created on first use (reference: create-if-absent alias
  * `alias/LambdaRedshiftLoaderKey`), authenticated encryption with an
  * AAD context equivalent to the reference's
  * `EncryptionContext {module, region}`, and the same single/array/map
  * helpers. Ciphertext format: base64(iv ++ ct ++ tag).
  */
class Keystore(keyPath: Path, context: String = "graft-engine") {

  private val rng = new SecureRandom()

  private lazy val key: SecretKey = {
    if (!Files.exists(keyPath)) {
      val raw = new Array[Byte](32)
      rng.nextBytes(raw)
      Files.createDirectories(keyPath.getParent)
      Files.write(keyPath, Base64.getEncoder.encode(raw))
    }
    new SecretKeySpec(Base64.getDecoder.decode(Files.readAllBytes(keyPath)), "AES")
  }

  def encrypt(plaintext: String): String = {
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key, new GCMParameterSpec(128, iv))
    c.updateAAD(context.getBytes("UTF-8"))
    val ct = c.doFinal(plaintext.getBytes("UTF-8"))
    Base64.getEncoder.encodeToString(iv ++ ct)
  }

  def decrypt(ciphertext: String): String = {
    val raw = Base64.getDecoder.decode(ciphertext)
    val (iv, ct) = raw.splitAt(12)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key, new GCMParameterSpec(128, iv))
    c.updateAAD(context.getBytes("UTF-8"))
    new String(c.doFinal(ct), "UTF-8")
  }

  /** Byte-level forms — the S11 encrypted-file seam (whole-file
    * envelope, same iv ++ ct ++ tag layout without the base64).
    */
  def encryptBytes(plain: Array[Byte]): Array[Byte] = {
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key, new GCMParameterSpec(128, iv))
    c.updateAAD(context.getBytes("UTF-8"))
    iv ++ c.doFinal(plain)
  }

  def decryptBytes(enc: Array[Byte]): Array[Byte] = {
    val (iv, ct) = enc.splitAt(12)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.DECRYPT_MODE, key, new GCMParameterSpec(128, iv))
    c.updateAAD(context.getBytes("UTF-8"))
    c.doFinal(ct)
  }

  /** kmsCrypto.encryptAll / decryptAll array helpers. */
  def encryptAll(values: Seq[String]): Seq[String] = values.map(encrypt)
  def decryptAll(values: Seq[String]): Seq[String] = values.map(decrypt)

  /** kmsCrypto map helpers (encryptMap/decryptMap). */
  def encryptMap(m: Map[String, String]): Map[String, String] = m.map { case (k, v) => k -> encrypt(v) }
  def decryptMap(m: Map[String, String]): Map[String, String] = m.map { case (k, v) => k -> decrypt(v) }
}

object Keystore {
  def apply(dir: String): Keystore = new Keystore(Paths.get(dir, "graft-master.key"))

  /** A decryptor closure safe to ship into Spark tasks: captures only the
    * key-file path string and rebuilds the keystore executor-side (the
    * Keystore itself holds a SecureRandom and is not serializable).
    */
  def fileDecryptor(dir: String, context: String = "graft-engine"): Array[Byte] => Array[Byte] = {
    val keyPath = Paths.get(dir, "graft-master.key").toString
    bytes => new Keystore(Paths.get(keyPath), context).decryptBytes(bytes)
  }
}
