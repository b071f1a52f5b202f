package object graft {
  object BuildInfo {
    val version = "0.1.0"
  }
}
